"""Exact host-side BN254 G1/G2 group arithmetic and point codecs.

Points are represented as:
- affine: (x, y) tuples, or ``None`` for the identity;
- G2 affine coordinates are Fq2 pairs ((x0,x1),(y0,y1)).

Byte formats mirror the halo2curves backend the reference builds on:
- compressed (``Processed``): 32 B (G1) / 64 B (G2) little-endian x with the
  y-parity sign flag in bit 7 of the last byte; identity is all-zeroes.
- raw (``RawBytes``): uncompressed x||y with each coordinate in Montgomery
  little-endian form (64 B G1 / 128 B G2); identity is all-zeroes.
Reference consumers: transcript point reads (transcript/mod.rs:158-166) and
vk/params codecs (helpers.rs:33-65).
"""

from __future__ import annotations

from .constants import B_G1, B_G2, P, R
from . import hostfield as hf


# ------------------------------------------------------------------ G1 (Fq)

def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - B_G1) % P == 0


def g1_neg(pt):
    if pt is None:
        return None
    return (pt[0], -pt[1] % P)


def g1_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        return g1_double(a)
    lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    y3 = (lam * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_double(a):
    if a is None:
        return None
    x, y = a
    if y == 0:
        return None
    lam = 3 * x * x * pow(2 * y, -1, P) % P
    x3 = (lam * lam - 2 * x) % P
    y3 = (lam * (x - x3) - y) % P
    return (x3, y3)


def g1_mul(pt, k: int):
    k %= R
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = g1_add(acc, add)
        add = g1_double(add)
        k >>= 1
    return acc


def g1_msm(scalars, points):
    """Naive host MSM (correctness oracle for the TPU Pippenger kernels).

    Small-window Pippenger in pure Python mirroring arithmetic.rs:7-95
    would gain little here; the device path is the fast one.
    """
    assert len(scalars) == len(points)
    acc = None
    for s, p in zip(scalars, points):
        if s % R == 0 or p is None:
            continue
        acc = g1_add(acc, g1_mul(p, s))
    return acc


# compressed codec -----------------------------------------------------------

def g1_to_bytes(pt) -> bytes:
    if pt is None:
        return bytes(32)
    x, y = pt
    b = bytearray(hf.to_repr(x))
    if y & 1:
        b[31] |= 0x80
    return bytes(b)


def g1_from_bytes(b: bytes):
    """Decompress; raises ValueError on invalid encodings (CurveRead path)."""
    assert len(b) == 32
    arr = bytearray(b)
    ysign = (arr[31] >> 7) & 1
    arr[31] &= 0x7F
    x = hf.from_repr(bytes(arr), P)
    if x == 0 and ysign == 0:
        return None
    y = hf.fq_sqrt((x * x * x + B_G1) % P)
    if y is None:
        raise ValueError("invalid point encoding: x not on curve")
    if (y & 1) != ysign:
        y = -y % P
    return (x, y)


# raw (Montgomery, uncompressed) codec ---------------------------------------

def g1_to_raw(pt) -> bytes:
    if pt is None:
        return bytes(64)
    return hf.fq_to_raw(pt[0]) + hf.fq_to_raw(pt[1])


def g1_from_raw(b: bytes, check: bool = True):
    assert len(b) == 64
    x = hf.fq_from_raw(b[:32], check)
    y = hf.fq_from_raw(b[32:], check)
    if x == 0 and y == 0:
        return None
    pt = (x, y)
    if check and not g1_is_on_curve(pt):
        raise ValueError("raw point not on curve")
    return pt


# ------------------------------------------------------------------ G2 (Fq2)

def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = hf.fq2_square(y)
    rhs = hf.fq2_add(hf.fq2_mul(hf.fq2_square(x), x), B_G2)
    return lhs == rhs


def g2_neg(pt):
    if pt is None:
        return None
    return (pt[0], hf.fq2_neg(pt[1]))


def g2_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if hf.fq2_add(y1, y2) == hf.FQ2_ZERO:
            return None
        return g2_double(a)
    lam = hf.fq2_mul(hf.fq2_sub(y2, y1), hf.fq2_inv(hf.fq2_sub(x2, x1)))
    x3 = hf.fq2_sub(hf.fq2_sub(hf.fq2_square(lam), x1), x2)
    y3 = hf.fq2_sub(hf.fq2_mul(lam, hf.fq2_sub(x1, x3)), y1)
    return (x3, y3)


def g2_double(a):
    if a is None:
        return None
    x, y = a
    if y == hf.FQ2_ZERO:
        return None
    lam = hf.fq2_mul(
        hf.fq2_mul_scalar(hf.fq2_square(x), 3),
        hf.fq2_inv(hf.fq2_mul_scalar(y, 2)),
    )
    x3 = hf.fq2_sub(hf.fq2_square(lam), hf.fq2_mul_scalar(x, 2))
    y3 = hf.fq2_sub(hf.fq2_mul(lam, hf.fq2_sub(x, x3)), y)
    return (x3, y3)


def g2_mul(pt, k: int):
    k %= R
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_double(add)
        k >>= 1
    return acc


def g2_to_bytes(pt) -> bytes:
    if pt is None:
        return bytes(64)
    x, y = pt
    b = bytearray(hf.fq2_to_repr(x))
    if hf.fq2_is_odd(y):
        b[63] |= 0x80
    return bytes(b)


def g2_from_bytes(b: bytes):
    assert len(b) == 64
    arr = bytearray(b)
    ysign = (arr[63] >> 7) & 1
    arr[63] &= 0x7F
    x = hf.fq2_from_repr(bytes(arr))
    if x == hf.FQ2_ZERO and ysign == 0:
        return None
    y2 = hf.fq2_add(hf.fq2_mul(hf.fq2_square(x), x), B_G2)
    y = hf.fq2_sqrt(y2)
    if y is None:
        raise ValueError("invalid G2 point encoding")
    if hf.fq2_is_odd(y) != bool(ysign):
        y = hf.fq2_neg(y)
    return (x, y)


def g2_to_raw(pt) -> bytes:
    if pt is None:
        return bytes(128)
    return hf.fq2_to_raw(pt[0]) + hf.fq2_to_raw(pt[1])


def g2_from_raw(b: bytes, check: bool = True):
    assert len(b) == 128
    x = hf.fq2_from_raw(b[:64], check)
    y = hf.fq2_from_raw(b[64:], check)
    if x == hf.FQ2_ZERO and y == hf.FQ2_ZERO:
        return None
    pt = (x, y)
    if check and not g2_is_on_curve(pt):
        raise ValueError("raw G2 point not on curve")
    return pt
