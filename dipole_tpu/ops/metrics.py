"""Accuracy metrics (reference util.py:666-694).

All metrics are symmetrized: a globally flipped orientation scores the same,
because global sign is fixed separately by the lattice-potential step.
"""
from __future__ import annotations

import numpy as np

__all__ = ["cal_nd_loss", "cal_90_count", "cal_metrics", "sign_agreement"]

_PI = 3.1415926  # the reference's pi; kept for numeric parity of degrees


def _angles_deg(pc1, pc2) -> np.ndarray:
    n1 = np.asarray(pc1)[:, 3:6]
    n2 = np.asarray(pc2)[:, 3:6]
    cos = np.clip((n1 * n2).sum(axis=1), -1.0, 1.0)
    return np.arccos(cos) * 180.0 / _PI


def cal_nd_loss(pc1, pc2) -> float:
    """Mean angular error in degrees, symmetrized (util.py:666-676)."""
    angle = float(_angles_deg(pc1, pc2).mean())
    return min(angle, 180.0 - angle)


def cal_90_count(pc1, pc2) -> int:
    """Count of <90-degree normal agreements, symmetrized (util.py:678-688)."""
    angle = _angles_deg(pc1, pc2)
    count = int((angle < 90.0).sum())
    return min(count, len(angle) - count)


def cal_metrics(pc1, pc2) -> dict:
    return {
        "loss": cal_nd_loss(pc1, pc2),
        "count_90": cal_90_count(pc1, pc2),
        "total_count": len(np.asarray(pc1)),
    }


def sign_agreement(pc1, pc2) -> float:
    """Fraction of points whose normal signs agree (symmetrized) — the
    acceptance metric from BASELINE.json."""
    n1 = np.asarray(pc1)[:, 3:6]
    n2 = np.asarray(pc2)[:, 3:6]
    agree = ((n1 * n2).sum(axis=1) > 0).mean()
    return float(max(agree, 1.0 - agree))
