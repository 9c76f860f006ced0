"""dipole_tpu — TPU-native dipole normal propagation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
crazyMessi/dipole-normal-prop (SIGGRAPH 2021 "Orienting Point Clouds with
Dipole Propagation" + fork extensions): point-cloud normal orientation via
dipole field propagation, patch pipelines with a PointCNN flip-classifier
ensemble, mirror-field ("xie") multi-start BFS propagation with vote
alignment, patch-graph global flip solving, and a TCP network service.

Compute path is JAX/XLA with Pallas TPU kernels for the pairwise field
evaluations; host-side graph/runtime utilities have optional C++ acceleration.
"""

__version__ = "0.1.0"

from dipole_tpu.utils import jaxsetup as _jaxsetup  # noqa: F401
from dipole_tpu.utils import io as io  # noqa: F401
from dipole_tpu.ops import fields as fields  # noqa: F401


def orient(points, method: str = "auto", models=(), **kwargs):
    """One-call in-memory orientation — see `dipole_tpu.api.orient`."""
    from dipole_tpu import api

    return api.orient(points, method=method, models=models, **kwargs)
