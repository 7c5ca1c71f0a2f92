"""Fixed-limb big-integer representation for TPU kernels.

Field elements are vectors of NLIMBS=16 limbs of LIMB_BITS=16 bits stored in
uint32 lanes (trailing axis). The 16-bit choice is what makes TPU arithmetic
exact: a full limb product a_i*b_j < 2^32 fits a uint32 lane, and its 16-bit
halves accumulate across a 16-term convolution without overflow
(32 * 2^16 = 2^21 << 2^32). See docs/DESIGN.md for the cost model.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
NLIMBS = 16  # 256 bits
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, n: int = NLIMBS) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint32)
    for i in range(n):
        out[i] = (v >> (LIMB_BITS * i)) & MASK
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    arr = np.asarray(limbs, dtype=np.uint64)
    for i in range(arr.shape[-1] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(arr[..., i])
    return v


def ints_to_limbs(values, n: int = NLIMBS) -> np.ndarray:
    """Batch conversion: list of ints -> (len, n) uint32. One C-level
    to_bytes per value + a single frombuffer — no Python limb loop."""
    nbytes = (LIMB_BITS // 8) * n
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(values), n)
    return u16.astype(np.uint32)


def limbs_to_ints(arr) -> list[int]:
    arr = np.asarray(arr)
    assert arr.ndim == 2
    n = arr.shape[1]
    nbytes = (LIMB_BITS // 8) * n
    packed = np.ascontiguousarray(arr.astype("<u2")).tobytes()
    return [
        int.from_bytes(packed[i * nbytes:(i + 1) * nbytes], "little")
        for i in range(arr.shape[0])
    ]
