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


# ---------------------------------------------------------------------------
# Torch-compatible writer (pure Python, no torch import): emits the pickle
# opcode stream for an OrderedDict of _rebuild_tensor_v2 entries directly,
# so checkpoints trained here load with torch.load as well as load_state_dict.
# ---------------------------------------------------------------------------

_REV_DTYPES = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


class _PickleWriter:
    """Minimal protocol-2 pickle emitter for the checkpoint object graph."""

    def __init__(self):
        import struct

        self._struct = struct
        self.out = bytearray()
        self.memo: dict = {}
        self.out += b"\x80\x02"  # PROTO 2

    def _put(self, key):
        # memoize with LONG_BINPUT for simplicity
        idx = len(self.memo)
        self.memo[key] = idx
        self.out += b"r" + self._struct.pack("<I", idx)

    def global_(self, module: str, name: str):
        key = ("global", module, name)
        if key in self.memo:
            self.out += b"j" + self._struct.pack("<I", self.memo[key])
            return
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"
        self._put(key)

    def string(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + self._struct.pack("<I", len(b)) + b

    def int_(self, v: int):
        self.out += b"J" + self._struct.pack("<i", v)

    def bool_(self, v: bool):
        self.out += b"\x88" if v else b"\x89"

    def mark(self):
        self.out += b"("

    def tuple_(self):
        self.out += b"t"

    def empty_tuple(self):
        self.out += b")"

    def reduce(self):
        self.out += b"R"

    def binpersid(self):
        self.out += b"Q"

    def stop(self):
        self.out += b"."


def save_state_dict(state_dict, path) -> None:
    """Write a torch-zip-format .pt checkpoint from numpy arrays.

    The output loads with both load_state_dict (this module) and torch.load.
    Arrays are written contiguous; keys preserve insertion order."""
    import zipfile

    path = Path(path)
    stem = path.stem
    w = _PickleWriter()
    storages: list[tuple[str, np.ndarray]] = []

    # OrderedDict([(k, tensor), ...]) via REDUCE
    w.global_("collections", "OrderedDict")
    w.mark()          # args tuple for OrderedDict
    w.mark()          # the list of pairs -> use a tuple of pairs (accepted)
    for key, arr in state_dict.items():
        arr = np.ascontiguousarray(np.asarray(arr))
        if arr.dtype not in _REV_DTYPES:
            raise ValueError(f"unsupported dtype {arr.dtype} for {key}")
        storage_key = str(len(storages))
        storages.append((storage_key, arr))
        w.mark()      # (key, tensor)
        w.string(key)
        # tensor = _rebuild_tensor_v2(storage, 0, size, stride, False, OrderedDict())
        w.global_("torch._utils", "_rebuild_tensor_v2")
        w.mark()
        # persistent id tuple ('storage', Type, key, 'cpu', numel)
        w.mark()
        w.string("storage")
        w.global_("torch", _REV_DTYPES[arr.dtype])
        w.string(storage_key)
        w.string("cpu")
        w.int_(arr.size)
        w.tuple_()
        w.binpersid()
        w.int_(0)
        w.mark()
        for s in arr.shape:
            w.int_(int(s))
        w.tuple_()
        w.mark()
        stride = [st // arr.itemsize for st in arr.strides]
        for s in stride:
            w.int_(int(s))
        w.tuple_()
        w.bool_(False)
        w.global_("collections", "OrderedDict")
        w.empty_tuple()
        w.reduce()
        w.tuple_()
        w.reduce()
        w.tuple_()    # close (key, tensor)
    w.tuple_()        # close the pairs tuple
    w.tuple_()        # close OrderedDict args: (pairs,)
    w.reduce()
    w.stop()

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{stem}/data.pkl", bytes(w.out))
        for key, arr in storages:
            zf.writestr(f"{stem}/data/{key}", arr.tobytes())
        zf.writestr(f"{stem}/version", "3\n")
