"""Batched BN254 G1 ops, limbs-major, with fused Pallas point kernels.

Points are homogeneous projective (X:Y:Z) triples of (NLIMBS, B) Montgomery
Fq limb arrays (ops/lmfield.py), identity = (0:1:0). Addition and doubling
use the Renes-Costello-Batina (2015) COMPLETE formulas for a=0 curves —
branchless, valid for every input pair (identity, doubling, inverses), which
the MSM's sort + scan execution model requires.

On TPU the entire complete-add (12 Montgomery multiplies + ~20 modular
add/subs) runs as ONE Pallas kernel: every intermediate lives in VMEM, so a
point-add touches HBM for exactly 9 coordinate arrays (6 in, 3 out) — the
XLA elementwise pipeline materialized hundreds of intermediates and measured
~99 ms per 131k-batch add; the kernel's traffic bound is ~0.3 ms.

Reference baseline: halo2curves' branchy per-case ops, re-exported at
arithmetic.rs:1-3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .constants import B_G1, P
from .field_jax import FQ
from .limbs import NLIMBS
from . import lmfield as lf

U32 = jnp.uint32

assert B_G1 == 3, "the x9 add chain below assumes b=3 (3b=9)"


def _mul_b3(x):
    """x * 3b = x * 9 via an add chain (Montgomery form is linear, so
    small-integer scaling needs no multiply): 4 modular adds beat one
    Montgomery multiply ~8x, and leave no array constants for the Pallas
    kernels to capture."""
    d1 = lf.add_body(x, x, FQ)
    d2 = lf.add_body(d1, d1, FQ)
    d3 = lf.add_body(d2, d2, FQ)
    return lf.add_body(d3, x, FQ)


def identity(b: int):
    zero = jnp.zeros((NLIMBS, b), dtype=U32)
    return (zero, lf.mont_one(FQ, b), zero)


def from_affine(x, y):
    """(x, y) Montgomery limb arrays -> projective; (0,0) = identity."""
    inf = lf.is_zero(x) & lf.is_zero(y)
    one = lf.mont_one(FQ, x.shape[1])
    zero = jnp.zeros_like(x)
    return (
        lf.select(inf, zero, x),
        lf.select(inf, one, y),
        lf.select(inf, zero, one),
    )


def add_body(p, q):
    """Complete addition (RCB15 algorithm 7, a=0) as a pure-jnp dataflow."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    mul = lambda a, b: lf.mont_mul_body(a, b, FQ)
    ad = lambda a, b: lf.add_body(a, b, FQ)
    sb = lambda a, b: lf.sub_body(a, b, FQ)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sb(mul(ad(X1, Y1), ad(X2, Y2)), ad(t0, t1))
    t4 = sb(mul(ad(Y1, Z1), ad(Y2, Z2)), ad(t1, t2))
    y3 = sb(mul(ad(X1, Z1), ad(X2, Z2)), ad(t0, t2))
    t2b = _mul_b3(t2)
    x3 = ad(ad(t0, t0), t0)  # 3*t0
    z3 = ad(t1, t2b)
    t1m = sb(t1, t2b)
    y3b = _mul_b3(y3)
    X3 = sb(mul(t3, t1m), mul(t4, y3b))
    Y3 = ad(mul(y3b, x3), mul(t1m, z3))
    Z3 = ad(mul(z3, t4), mul(x3, t3))
    return (X3, Y3, Z3)


def double_body(p):
    """Complete doubling (RCB15 algorithm 9, a=0)."""
    X, Y, Z = p
    mul = lambda a, b: lf.mont_mul_body(a, b, FQ)
    ad = lambda a, b: lf.add_body(a, b, FQ)
    sb = lambda a, b: lf.sub_body(a, b, FQ)

    t0 = mul(Y, Y)
    t1 = mul(Y, Z)
    t2 = _mul_b3(mul(Z, Z))
    t3 = mul(X, Y)
    z3 = ad(ad(t0, t0), ad(t0, t0))
    z3 = ad(z3, z3)  # 8*Y^2... times Y*Z below
    y3 = ad(t0, t2)
    t0m = sb(t0, ad(ad(t2, t2), t2))  # t0 - 3*t2
    x3 = mul(t0m, t3)
    x3 = ad(x3, x3)
    y3 = ad(mul(t2, z3), mul(t0m, y3))
    z3 = mul(t1, z3)
    return (x3, y3, z3)


def select_point(cond, p, q):
    return tuple(lf.select(cond, a, b) for a, b in zip(p, q))


def is_identity(p):
    return lf.is_zero(p[2])


# ----------------------------------------------------------- pallas fusion

def _add_kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz):
    r = add_body(
        (x1[:, :], y1[:, :], z1[:, :]), (x2[:, :], y2[:, :], z2[:, :])
    )
    ox[:, :], oy[:, :], oz[:, :] = r


def _masked_add_kernel(x1, y1, z1, x2, y2, z2, m, ox, oy, oz):
    """out = mask ? p + q : p — the scan-step primitive. Fusing the select
    into the kernel keeps the un-selected coordinates in VMEM instead of
    round-tripping both the add result and the original through HBM.
    The mask arrives pre-broadcast to the full (NLIMBS, B) tile: Mosaic's
    layout inference rejects 1-sublane blocks."""
    p = (x1[:, :], y1[:, :], z1[:, :])
    r = add_body(p, (x2[:, :], y2[:, :], z2[:, :]))
    mask = m[:, :] != 0
    ox[:, :], oy[:, :], oz[:, :] = (
        jnp.where(mask, r[0], p[0]),
        jnp.where(mask, r[1], p[1]),
        jnp.where(mask, r[2], p[2]),
    )


def _double_kernel(x, y, z, ox, oy, oz):
    r = double_body((x[:, :], y[:, :], z[:, :]))
    ox[:, :], oy[:, :], oz[:, :] = r


def _point_pallas_call(kernel, n_in, coords):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = coords[0].shape
    grid = (shape[1] // lf.BLOCK_B,)
    bs = pl.BlockSpec((NLIMBS, lf.BLOCK_B), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, coords[0].dtype) for _ in range(3)
        ),
        grid=grid,
        in_specs=[bs] * n_in,
        out_specs=(bs, bs, bs),
    )(*coords)
    return tuple(out)


@jax.jit
def _add_pallas(p, q):
    return _point_pallas_call(_add_kernel, 6, (*p, *q))


@jax.jit
def _masked_add_pallas(p, q, mask_row):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p[0].shape
    grid = (shape[1] // lf.BLOCK_B,)
    bs = pl.BlockSpec((NLIMBS, lf.BLOCK_B), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((NLIMBS, lf.BLOCK_B), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    mask_full = jnp.broadcast_to(mask_row, shape)
    out = pl.pallas_call(
        _masked_add_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, p[0].dtype) for _ in range(3)
        ),
        grid=grid,
        in_specs=[bs] * 6 + [ms],
        out_specs=(bs, bs, bs),
    )(*p, *q, mask_full)
    return tuple(out)


@jax.jit
def _double_pallas(p):
    return _point_pallas_call(_double_kernel, 3, p)


def _flatten_pad(coords):
    """(NLIMBS, ...) coords -> (NLIMBS, B_padded) 2-D views for the kernel;
    returns (flat_coords, orig_shape, orig_B). Zero-padding is benign: the
    kernels are pure elementwise dataflows and padded lanes are sliced off."""
    shape = coords[0].shape
    flat = [c.reshape(NLIMBS, -1) for c in coords]
    b = flat[0].shape[1]
    rem = (-b) % lf.BLOCK_B
    if rem:
        flat = [jnp.pad(c, ((0, 0), (0, rem))) for c in flat]
    return flat, shape, b


def _unflatten(coords, shape, b):
    return tuple(c[:, :b].reshape(shape) for c in coords)


def _pallas_ok(p):
    return lf.use_pallas() and p[0].ndim >= 2 and p[0].size >= NLIMBS * 512


def add(p, q):
    if _pallas_ok(p):
        flat, shape, b = _flatten_pad((*p, *q))
        out = _add_pallas(tuple(flat[:3]), tuple(flat[3:]))
        return _unflatten(out, shape, b)
    return add_body(p, q)


def masked_add(p, q, mask):
    """mask ? p + q : p, with mask shaped like the coords' non-limb axes.
    One fused kernel on TPU; body + select fallback elsewhere."""
    if _pallas_ok(p):
        flat, shape, b = _flatten_pad((*p, *q))
        mrow = jnp.asarray(mask, dtype=jnp.uint8).reshape(1, -1)
        rem = (-mrow.shape[1]) % lf.BLOCK_B
        if rem:
            mrow = jnp.pad(mrow, ((0, 0), (0, rem)))
        out = _masked_add_pallas(tuple(flat[:3]), tuple(flat[3:]), mrow)
        return _unflatten(out, shape, b)
    return select_point(mask, add_body(p, q), p)


def double(p):
    if _pallas_ok(p):
        flat, shape, b = _flatten_pad(p)
        out = _double_pallas(tuple(flat))
        return _unflatten(out, shape, b)
    return double_body(p)


def to_affine_host(proj_np):
    """Projective -> affine on the HOST: proj_np is a tuple of 3 numpy
    (NLIMBS, B) Montgomery limb arrays; returns a list of (x, y) int pairs
    (None for identity). Exact Python-int math; used for the handful of
    final points per MSM."""
    import numpy as np

    from .constants import P
    from .hostfield import batch_invert
    from .limbs import limbs_to_ints

    rinv = pow(FQ.mont_r, -1, P)
    xs = limbs_to_ints(np.asarray(proj_np[0]).T)
    ys = limbs_to_ints(np.asarray(proj_np[1]).T)
    zs = limbs_to_ints(np.asarray(proj_np[2]).T)
    # de-Montgomery-ize: value = limbs * R^-1
    xs = [v * rinv % P for v in xs]
    ys = [v * rinv % P for v in ys]
    zs = [v * rinv % P for v in zs]
    zinv = batch_invert(zs, P)
    out = []
    for x, y, zi, z in zip(xs, ys, zinv, zs):
        if z == 0:
            out.append(None)
        else:
            out.append((x * zi % P, y * zi % P))
    return out
