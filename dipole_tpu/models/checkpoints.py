"""Torch-free PyTorch checkpoint reader.

The reference ships three PointCNN state_dicts (pre_trained/*.pt,
reference inference_utils.py:38-44) that this framework must load without
a torch dependency (SURVEY §5.4). A .pt file is a zip archive holding a
pickled object graph (`<name>/data.pkl`) whose tensors are persistent-id
references into raw little-endian storage blobs (`<name>/data/<key>`).

This module implements a restricted unpickler that materializes those
tensors as numpy arrays: only OrderedDict, torch storage type markers and
torch._utils._rebuild_tensor_v2 are allowed — anything else in the pickle
stream is rejected, so loading untrusted files cannot execute code.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from pathlib import Path

import numpy as np

__all__ = ["load_state_dict", "load_model_opts"]

_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}


class _StorageTag:
    def __init__(self, name: str):
        self.dtype = _DTYPES[name]


class _Storage:
    def __init__(self, key: str, dtype: np.dtype, reader):
        self.key = key
        self.dtype = dtype
        self._reader = reader
        self._data = None

    def array(self) -> np.ndarray:
        if self._data is None:
            self._data = np.frombuffer(self._reader(self.key), dtype=self.dtype)
        return self._data


def _rebuild_tensor_v2(storage: _Storage, offset, size, stride, requires_grad,
                       backward_hooks, metadata=None) -> np.ndarray:
    flat = storage.array()
    itemsize = flat.dtype.itemsize
    return np.lib.stride_tricks.as_strided(
        flat[offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    ).copy()


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, f, reader):
        super().__init__(f)
        self._reader = reader

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch" and name in _DTYPES:
            return _StorageTag(name)
        raise pickle.UnpicklingError(f"blocked unpickle of {module}.{name}")

    def persistent_load(self, pid):
        kind, tag, key, _location, _numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id kind {kind!r}")
        return _Storage(str(key), tag.dtype, self._reader)


def load_state_dict(path) -> "OrderedDict[str, np.ndarray]":
    """Load a zip-format .pt state_dict into an OrderedDict of numpy arrays."""
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[: -len("data.pkl")]

        def reader(key: str) -> bytes:
            return zf.read(f"{root}data/{key}")

        with zf.open(pkl_name) as f:
            obj = _RestrictedUnpickler(io.BytesIO(f.read()), reader).load()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    return obj


def load_model_opts(path) -> dict:
    """Parse the sidecar .txt hyperparameter file (only key: pool) —
    reference inference_utils.txt2opts (:19-35)."""
    opts = {}
    for line in Path(path).read_text().split("\n"):
        line = line.replace(" ", "")
        if not line:
            continue
        tokens = line.split(":")
        if tokens[0] == "pool":
            opts["pool"] = float(tokens[1])
    return opts
