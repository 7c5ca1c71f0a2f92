"""Batched BN254 G1 group ops on TPU.

Points are homogeneous projective (X:Y:Z) triples of Montgomery-form Fq limb
vectors, identity = (0:1:0). Addition/doubling use the Renes-Costello-Batina
(2015) COMPLETE formulas for a=0 curves: branchless, valid for every input
pair (identity, doubling, inverses), which is exactly what a SIMD/associative
-scan execution model needs — no data-dependent control flow anywhere.

The reference gets these ops from halo2curves with per-case branches
(arithmetic.rs re-exports); completeness replaces the branches here.
"""

from __future__ import annotations

import jax.numpy as jnp

from .constants import B_G1, P
from .limbs import NLIMBS, int_to_limbs
from . import field_jax as fj
from .field_jax import FQ

# b3 = 3*b = 9 in Montgomery form
_B3_INT = (3 * B_G1) % P
_B3 = jnp.asarray(int_to_limbs(_B3_INT * FQ.mont_r % P), dtype=jnp.uint32)


def identity(shape=()):
    zero = jnp.zeros(shape + (NLIMBS,), dtype=jnp.uint32)
    one = fj.mont_one(FQ, shape)
    return (zero, one, zero)


def from_affine(x, y):
    """(x, y) Montgomery limb arrays -> projective; (0,0) input maps to the
    identity (the convention used for None/infinity on the host side)."""
    inf = fj.is_zero(x) & fj.is_zero(y)
    one = fj.mont_one(FQ, x.shape[:-1])
    zero = jnp.zeros_like(x)
    return (
        fj.select(inf, zero, x),
        fj.select(inf, one, y),
        fj.select(inf, zero, one),
    )


def to_affine_batch(pt):
    """Projective -> affine (Montgomery); identity maps to (0, 0)."""
    X, Y, Z = pt
    zinv = fj.inv_mont(Z, FQ)
    x = fj.mont_mul(X, zinv, FQ)
    y = fj.mont_mul(Y, zinv, FQ)
    inf = fj.is_zero(Z)
    return fj.select(inf, jnp.zeros_like(x), x), fj.select(inf, jnp.zeros_like(y), y)


def _stack(parts):
    return jnp.stack(parts, axis=0)


def _unstack(arr, k):
    return tuple(arr[i] for i in range(k))


def add(p, q):
    """Complete addition (RCB15 algorithm 7, a=0).

    The 12 field multiplications are grouped into 3 stacked mont_mul calls
    (and the ~10 additions into a handful of stacked calls): ~4x smaller
    XLA graphs and wider VPU batches than a literal transcription.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    ad = lambda a, b: fj.add(a, b, FQ)
    sb = lambda a, b: fj.sub(a, b, FQ)

    # stage A: paired sums feeding the Karatsuba-style cross terms
    s = ad(_stack([X1, Y1, X1, X2, Y2, X2]), _stack([Y1, Z1, Z1, Y2, Z2, Z2]))
    # stage B: 6 independent products
    m = fj.mont_mul(
        _stack([X1, Y1, Z1, s[0], s[1], s[2]]),
        _stack([X2, Y2, Z2, s[3], s[4], s[5]]),
        FQ,
    )
    t0, t1, t2, m3, m4, m5 = _unstack(m, 6)
    # stage C: cross terms
    sums = ad(_stack([t0, t1, t0]), _stack([t1, t2, t2]))
    t3, t4, y3 = _unstack(sb(_stack([m3, m4, m5]), sums), 3)
    # stage D: b3 scalings and linear combos
    b3m = fj.mont_mul(_stack([t2, y3]), _B3, FQ)
    t2b, y3b = _unstack(b3m, 2)
    x3 = ad(ad(t0, t0), t0)  # 3*t0
    z3 = ad(t1, t2b)
    t1m = sb(t1, t2b)
    # stage E: 6 final products
    e = fj.mont_mul(
        _stack([t3, t4, y3b, t1m, z3, x3]),
        _stack([t1m, y3b, x3, z3, t4, t3]),
        FQ,
    )
    X3 = sb(e[0], e[1])
    yz = ad(_stack([e[2], e[4]]), _stack([e[3], e[5]]))
    return (X3, yz[0], yz[1])


def double(p):
    """Complete doubling (RCB15 algorithm 9, a=0), stacked like add()."""
    X, Y, Z = p
    ad = lambda a, b: fj.add(a, b, FQ)
    sb = lambda a, b: fj.sub(a, b, FQ)

    m = fj.mont_mul(_stack([Y, Y, Z, X]), _stack([Y, Z, Z, Y]), FQ)
    t0, t1, t2raw, t3 = _unstack(m, 4)
    t2 = fj.mont_mul(t2raw, _B3, FQ)
    z3 = ad(ad(t0, t0), ad(t0, t0))
    z3 = ad(z3, z3)  # 8 Y^2
    y3 = ad(t0, t2)
    t0m = sb(t0, ad(ad(t2, t2), t2))  # t0 - 3*t2
    e = fj.mont_mul(
        _stack([t2, t1, t0m, t0m]),
        _stack([z3, z3, y3, t3]),
        FQ,
    )
    x3 = ad(e[3], e[3])
    y3 = ad(e[0], e[2])
    return (x3, y3, e[1])


def select_point(cond, p, q):
    """cond ? p : q, batched over the leading axes."""
    return tuple(fj.select(cond, a, b) for a, b in zip(p, q))


def is_identity(p):
    return fj.is_zero(p[2])
