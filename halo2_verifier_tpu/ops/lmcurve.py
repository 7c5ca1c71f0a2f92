"""Batched BN254 G1 ops, limbs-major, with fused Pallas point kernels.

Points are homogeneous projective (X:Y:Z) triples of limbs-major Montgomery
Fq arrays, identity = (0:1:0). Addition and doubling use the
Renes-Costello-Batina (2015) COMPLETE formulas for a=0 curves — branchless,
valid for every input pair (identity, doubling, inverses), which the MSM's
sort + scan execution model requires.

Two field backends share this code via `make_point_ops`:
- ops/lmfield.py  — 16-bit limbs in uint32 lanes (16 rows);
- ops/lmfield8.py — 8-bit limbs in float32 lanes (32 rows), for VPUs where
  32-bit integer multiply is emulated ~20-30x slower than f32 (measured on
  v5e-class hardware) — f32 ops on <= 2^24 integers are exact.

On TPU an entire complete-add (12 Montgomery multiplies + ~20 modular
add/subs) runs as ONE Pallas kernel: every intermediate lives in VMEM, so a
point-add touches HBM for exactly its input/output coordinate arrays.

Reference baseline: halo2curves' branchy per-case ops, re-exported at
arithmetic.rs:1-3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .constants import B_G1
from .field_jax import FQ
from .limbs import NLIMBS
from . import lmfield as lf
from . import lmfield8 as l8

assert B_G1 == 3, "the x9 add chain below assumes b=3 (3b=9)"


class PointOps:
    """Complete G1 point operations over one limb backend.

    lfm: field module (lmfield or lmfield8) providing mont_mul_body,
    add_body, sub_body, select, is_zero, mont_one over (nlimbs, B) arrays.
    """

    def __init__(self, lfm, nlimbs: int, dtype, block_b: int, tag: str):
        self.lfm = lfm
        self.nlimbs = nlimbs
        self.dtype = dtype
        self.block_b = block_b
        self.tag = tag

        def _make_masked_add():
            nl = nlimbs

            def kernel(x1, y1, z1, x2, y2, z2, m, ox, oy, oz):
                p = (x1[:, :], y1[:, :], z1[:, :])
                r = self.add_body(p, (x2[:, :], y2[:, :], z2[:, :]))
                mask = m[:, :] != 0
                ox[:, :] = jnp.where(mask, r[0], p[0])
                oy[:, :] = jnp.where(mask, r[1], p[1])
                oz[:, :] = jnp.where(mask, r[2], p[2])

            @jax.jit
            def run(p, q, mask_full):
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu

                shape = p[0].shape
                grid = (shape[1] // block_b,)
                bs = pl.BlockSpec((nl, block_b), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
                out = pl.pallas_call(
                    kernel,
                    out_shape=tuple(
                        jax.ShapeDtypeStruct(shape, p[0].dtype)
                        for _ in range(3)
                    ),
                    grid=grid,
                    in_specs=[bs] * 7,
                    out_specs=(bs, bs, bs),
                )(*p, *q, mask_full)
                return tuple(out)

            return run

        self._masked_add_pallas = _make_masked_add()

    # ------------------------------------------------------ field helpers
    def _mul(self, a, b):
        return self.lfm.mont_mul_body(a, b, FQ)

    def _add(self, a, b):
        return self.lfm.add_body(a, b, FQ)

    def _sub(self, a, b):
        return self.lfm.sub_body(a, b, FQ)

    def _mul_b3(self, x):
        """x * 3b = x * 9 via an add chain (Montgomery form is linear)."""
        d1 = self._add(x, x)
        d2 = self._add(d1, d1)
        d3 = self._add(d2, d2)
        return self._add(d3, x)

    # -------------------------------------------------------- point bodies
    def identity(self, b: int):
        zero = jnp.zeros((self.nlimbs, b), dtype=self.dtype)
        return (zero, self.lfm.mont_one(FQ, b), zero)

    def from_affine(self, x, y):
        """(x, y) Montgomery limb arrays -> projective; (0,0) = identity."""
        inf = self.lfm.is_zero(x) & self.lfm.is_zero(y)
        one = self.lfm.mont_one(FQ, x.shape[1])
        zero = jnp.zeros_like(x)
        return (
            self.lfm.select(inf, zero, x),
            self.lfm.select(inf, one, y),
            self.lfm.select(inf, zero, one),
        )

    def add_body(self, p, q):
        """Complete addition (RCB15 algorithm 7, a=0)."""
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        mul, ad, sb = self._mul, self._add, self._sub
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        t3 = sb(mul(ad(X1, Y1), ad(X2, Y2)), ad(t0, t1))
        t4 = sb(mul(ad(Y1, Z1), ad(Y2, Z2)), ad(t1, t2))
        y3 = sb(mul(ad(X1, Z1), ad(X2, Z2)), ad(t0, t2))
        t2b = self._mul_b3(t2)
        x3 = ad(ad(t0, t0), t0)  # 3*t0
        z3 = ad(t1, t2b)
        t1m = sb(t1, t2b)
        y3b = self._mul_b3(y3)
        X3 = sb(mul(t3, t1m), mul(t4, y3b))
        Y3 = ad(mul(y3b, x3), mul(t1m, z3))
        Z3 = ad(mul(z3, t4), mul(x3, t3))
        return (X3, Y3, Z3)

    def double_body(self, p):
        """Complete doubling (RCB15 algorithm 9, a=0)."""
        X, Y, Z = p
        mul, ad, sb = self._mul, self._add, self._sub
        t0 = mul(Y, Y)
        t1 = mul(Y, Z)
        t2 = self._mul_b3(mul(Z, Z))
        t3 = mul(X, Y)
        z3 = ad(ad(t0, t0), ad(t0, t0))
        z3 = ad(z3, z3)
        y3 = ad(t0, t2)
        t0m = sb(t0, ad(ad(t2, t2), t2))
        x3 = mul(t0m, t3)
        x3 = ad(x3, x3)
        y3 = ad(mul(t2, z3), mul(t0m, y3))
        z3 = mul(t1, z3)
        return (x3, y3, z3)

    def select_point(self, cond, p, q):
        return tuple(self.lfm.select(cond, a, b) for a, b in zip(p, q))

    def is_identity(self, p):
        return self.lfm.is_zero(p[2])

    # ------------------------------------------------------- pallas fusion
    def _flatten_pad(self, coords):
        shape = coords[0].shape
        flat = [c.reshape(self.nlimbs, -1) for c in coords]
        b = flat[0].shape[1]
        rem = (-b) % self.block_b
        if rem:
            flat = [jnp.pad(c, ((0, 0), (0, rem))) for c in flat]
        return flat, shape, b

    def _unflatten(self, coords, shape, b):
        return tuple(c[:, :b].reshape(shape) for c in coords)

    def _pallas_ok(self, p):
        return (lf.use_pallas() and p[0].ndim >= 2
                and p[0].size >= self.nlimbs * 512)

    def masked_add(self, p, q, mask):
        """mask ? p + q : p — the scan-step primitive, one fused kernel on
        TPU (mask pre-broadcast to the full tile; Mosaic rejects 1-sublane
        blocks). Body + select fallback elsewhere."""
        if self._pallas_ok(p):
            flat, shape, b = self._flatten_pad((*p, *q))
            mrow = jnp.asarray(mask, dtype=jnp.uint8).reshape(1, -1)
            rem = (-mrow.shape[1]) % self.block_b
            if rem:
                mrow = jnp.pad(mrow, ((0, 0), (0, rem)))
            mask_full = jnp.broadcast_to(mrow, flat[0].shape)
            out = self._masked_add_pallas(
                tuple(flat[:3]), tuple(flat[3:]), mask_full
            )
            return self._unflatten(out, shape, b)
        return self.select_point(mask, self.add_body(p, q), p)

    def add(self, p, q):
        if self._pallas_ok(p):
            ones = jnp.ones(p[0].shape[1:], dtype=self.dtype)
            return self.masked_add(p, q, ones)
        return self.add_body(p, q)

    def double(self, p):
        # doubling is rare in the hot path (host Horner fold); body is fine
        return self.double_body(p)


OPS16 = PointOps(lf, NLIMBS, jnp.uint32, lf.BLOCK_B, "u16")
OPS8 = PointOps(l8, l8.NLIMBS8, jnp.float32, 512, "f8")


# ------------------------------------------------- legacy module-level API
# (the u32 16-bit backend, used by curve tests and the non-grouped MSM)

def identity(b: int):
    return OPS16.identity(b)


def from_affine(x, y):
    return OPS16.from_affine(x, y)


def add_body(p, q):
    return OPS16.add_body(p, q)


def double_body(p):
    return OPS16.double_body(p)


def select_point(cond, p, q):
    return OPS16.select_point(cond, p, q)


def is_identity(p):
    return OPS16.is_identity(p)


def masked_add(p, q, mask):
    return OPS16.masked_add(p, q, mask)


def add(p, q):
    return OPS16.add(p, q)


def double(p):
    if OPS16._pallas_ok(p):
        flat, shape, b = OPS16._flatten_pad(p)
        out = _double_pallas(tuple(flat))
        return OPS16._unflatten(out, shape, b)
    return OPS16.double_body(p)


def _double_kernel(x, y, z, ox, oy, oz):
    r = OPS16.double_body((x[:, :], y[:, :], z[:, :]))
    ox[:, :], oy[:, :], oz[:, :] = r


@jax.jit
def _double_pallas(p):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = p[0].shape
    grid = (shape[1] // lf.BLOCK_B,)
    bs = pl.BlockSpec((NLIMBS, lf.BLOCK_B), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _double_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape, p[0].dtype) for _ in range(3)
        ),
        grid=grid,
        in_specs=[bs, bs, bs],
        out_specs=(bs, bs, bs),
    )(*p)
    return tuple(out)


def to_affine_host(proj_np):
    """Projective -> affine on the HOST: proj_np is a tuple of 3 numpy
    limbs-major Montgomery arrays — (16, B) uint32 16-bit limbs or (32, B)
    float32 8-bit limbs. Returns a list of (x, y) int pairs (None for
    identity). Exact Python-int math; used for the handful of final points
    per MSM."""
    import numpy as np

    from .constants import P
    from .hostfield import batch_invert

    def col_ints(arr):
        arr = np.asarray(arr)
        if arr.shape[0] == NLIMBS:  # u32 16-bit limbs
            from .limbs import limbs_to_ints

            return limbs_to_ints(arr.T)
        # f32 8-bit limbs
        out = []
        a = arr.astype(np.int64)
        for i in range(arr.shape[1]):
            v = 0
            for k in range(arr.shape[0] - 1, -1, -1):
                v = (v << 8) + int(a[k, i])
            out.append(v)
        return out

    rinv = pow(FQ.mont_r, -1, P)
    xs = [v * rinv % P for v in col_ints(proj_np[0])]
    ys = [v * rinv % P for v in col_ints(proj_np[1])]
    zs = [v * rinv % P for v in col_ints(proj_np[2])]
    zinv = batch_invert(zs, P)
    out = []
    for x, y, zi, z in zip(xs, ys, zinv, zs):
        if z == 0:
            out.append(None)
        else:
            out.append((x * zi % P, y * zi % P))
    return out
