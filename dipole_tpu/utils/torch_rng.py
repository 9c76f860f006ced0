"""Torch-CPU-compatible Mersenne-Twister stream (standalone, no torch).

The reference pipelines pin `torch.manual_seed(1)` and draw every FPS random
start from torch's global CPU generator (orient_pointcloud.py:8; the fps
random_start draws one `torch.randint(n, (1,))` per pooling stage). Torch's
CPU generator is a standard MT19937 seeded with the raw 32-bit seed, and
`randint(n)` with n < 2**32 consumes exactly one 32-bit draw mapped by
modulo. Reimplementing that stream here lets the JAX pipeline replay the
reference's randomness bit-exactly (the last attributed 0.33% residual of
the golden-file comparison, BASELINE.md), without importing torch.

Validated against live torch in tests/test_parity_network.py.
"""
from __future__ import annotations

__all__ = ["TorchMT19937"]

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER_MASK = 0x80000000
_LOWER_MASK = 0x7FFFFFFF
_MASK32 = 0xFFFFFFFF


class TorchMT19937:
    """MT19937 with torch's seeding convention (state[0] = seed & 0xffffffff,
    Knuth multiplier recurrence) and torch's randint mapping (one 32-bit
    draw, modulo reduction) for ranges below 2**32."""

    def __init__(self, seed: int = 1):
        self.mt = [0] * _N
        self.mt[0] = seed & _MASK32
        for i in range(1, _N):
            self.mt[i] = (1812433253 * (self.mt[i - 1] ^ (self.mt[i - 1] >> 30))
                          + i) & _MASK32
        self.index = _N

    def _generate(self) -> None:
        mt = self.mt
        for i in range(_N):
            y = (mt[i] & _UPPER_MASK) | (mt[(i + 1) % _N] & _LOWER_MASK)
            nxt = mt[(i + _M) % _N] ^ (y >> 1)
            if y & 1:
                nxt ^= _MATRIX_A
            mt[i] = nxt
        self.index = 0

    def random32(self) -> int:
        """Next raw 32-bit output (tempered)."""
        if self.index >= _N:
            self._generate()
        y = self.mt[self.index]
        self.index += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & _MASK32

    def randint(self, n: int) -> int:
        """torch.randint(n, (1,)) equivalent for 0 < n < 2**32: one 32-bit
        draw reduced modulo n (torch transformation::uniform_int_from_to)."""
        if not 0 < n < (1 << 32):
            raise ValueError(f"randint range must be in (0, 2^32): {n}")
        return self.random32() % n
