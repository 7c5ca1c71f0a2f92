"""float32 8-bit-limb Montgomery field arithmetic — the TPU-fast backend.

Why f32: this VPU generation executes 32-bit integer multiplies ~20-30x
slower than f32 multiplies (measured; Mosaic emulates them), while f32
arithmetic on integers is EXACT up to 2^24. With 8-bit limbs (32 per
256-bit element) every product a_i*b_j <= 255^2 < 2^16 and every
convolution column sums <= 32 terms < 2^22 — comfortably inside the f32
mantissa, with no per-product lo/hi splitting at all (the 16-bit-limb u32
backend, ops/lmfield.py, must split every 32-bit product).

Montgomery R stays 2^256 (32 x 8 bits), so values in Montgomery form are
IDENTICAL to the u32 backend's — switching backends is pure re-limbing.

Shape convention: (NLIMBS8=32, B) float32, limbs-major, least-significant
limb first. Canonical limbs are integers in [0, 255]; intermediates may
ride up to ~2^22 between carry folds. All bounds are stated inline and the
whole layer is differential-tested against the Python-int oracle
(tests/test_lm8_kernels.py).

Reference baseline: the reference inherits field arithmetic from
halo2curves (arithmetic.rs:1-3); this layer is its TPU-native replacement
(same role as ops/lmfield.py, faster on VPUs without native 32-bit
integer multiply).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .field_jax import FQ, FR, FieldSpec

F32 = jnp.float32
NLIMBS8 = 32
LIMB_BITS8 = 8
BASE = 256.0
INV_BASE = 1.0 / 256.0
MASK8 = 255


def int_to_limbs8(v: int) -> np.ndarray:
    out = np.zeros(NLIMBS8, dtype=np.float32)
    for i in range(NLIMBS8):
        out[i] = float((v >> (8 * i)) & 0xFF)
    return out


def limbs8_to_int(col) -> int:
    v = 0
    for i in range(NLIMBS8 - 1, -1, -1):
        v = (v << 8) + int(round(float(col[i])))
    return v


def _spec_ints8(spec: FieldSpec):
    mod = spec.modulus
    ninv = (-pow(mod, -1, 1 << 256)) % (1 << 256)
    nl = [(mod >> (8 * i)) & 0xFF for i in range(NLIMBS8)]
    comp = [255 - v for v in nl]
    nv = [(ninv >> (8 * i)) & 0xFF for i in range(NLIMBS8)]
    r_mont = [(spec.mont_r >> (8 * i)) & 0xFF for i in range(NLIMBS8)]
    return nl, comp, nv, r_mont


_SPEC_INTS8 = {id(FQ): _spec_ints8(FQ), id(FR): _spec_ints8(FR)}


def _shift_rows_down(x):
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _hi(x):
    """floor(x / 256) — exact: x is an integer <= 2^24 and 1/256 is a power
    of two, so the product and floor round nothing."""
    return jnp.floor(x * INV_BASE)


def carry_fold(x, passes: int):
    """Shift-fold passes: integer columns <= 2^24 -> limbs <= 256 after 3
    passes (2^24 -> 255+2^16 -> 255+2^8 -> 255+1). Limbs <= 256 are safe
    convolution inputs (256 * 255 * 32 < 2^22 < 2^24)."""
    for _ in range(passes):
        h = _hi(x)
        x = (x - h * BASE) + _shift_rows_down(h)
    return x


def carry_full(x):
    """Fully canonical limbs (< 256): 3 folds then a Kogge-Stone
    generate/propagate completion for the residual 256-valued rows (same
    scheme as lmfield.carry_prop_static, in f32). Input columns <= 2^24;
    carries out of the top row are dropped."""
    x = carry_fold(x, 3)
    # x <= 256: value = r + 256*g, g in {0, 1}
    g = _hi(x)
    r = x - g * BASE
    G = _shift_rows_down(g)
    P = _shift_rows_down((r == MASK8).astype(F32))
    rows = x.shape[0]
    d = 1
    while d < rows:
        zG = jnp.concatenate([jnp.zeros_like(G[:d]), G[:-d]], axis=0)
        zP = jnp.concatenate([jnp.zeros_like(P[:d]), P[:-d]], axis=0)
        G = jnp.maximum(G, P * zG)
        P = P * zP
        d *= 2
    # out_k = (r_k + c_k) mod 256 — a row hitting 256 passes its carry on
    # via the propagate chain already (it is counted in c_{k+1}), so mask
    # WITHOUT re-propagating
    x = r + G
    return x - _hi(x) * BASE


def cond_sub_n(x, spec: FieldSpec):
    """x - N if x >= N else x, for canonical-limbed x < 2N."""
    _, comp, _, _ = _SPEC_INTS8[id(spec)]
    t = jnp.stack([x[k] + float(comp[k] + (k == 0)) for k in range(NLIMBS8)])
    t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
    t = carry_full(t)
    ge = t[NLIMBS8] > 0
    return jnp.where(ge[None], t[:NLIMBS8], x)


def add_body(a, b, spec: FieldSpec):
    return cond_sub_n(carry_full(a + b), spec)


def sub_body(a, b, spec: FieldSpec):
    nl, _, _, _ = _SPEC_INTS8[id(spec)]
    # a - b + 2^256 via complement add; overflow row = "no borrow"
    t = jnp.stack([
        a[k] + (float(MASK8) - b[k]) + (1.0 if k == 0 else 0.0)
        for k in range(NLIMBS8)
    ])
    t = jnp.concatenate([t, jnp.zeros_like(t[:1])], axis=0)
    t = carry_full(t)
    no_borrow = t[NLIMBS8] > 0
    r = jnp.stack([
        t[k] + jnp.where(no_borrow, 0.0, float(nl[k]))
        for k in range(NLIMBS8)
    ])
    return carry_full(r)


def neg_body(a, spec: FieldSpec):
    return sub_body(jnp.zeros_like(a), a, spec)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def select(cond, a, b):
    return jnp.where(cond[None, ...], a, b)


def mont_one(spec: FieldSpec, b: int):
    _, _, _, r_mont = _SPEC_INTS8[id(spec)]
    col = jnp.asarray(np.asarray(r_mont, dtype=np.float32).reshape(
        NLIMBS8, 1))
    return jnp.broadcast_to(col, (NLIMBS8, b))


def _embed_rows(rows, offset: int, total: int):
    parts = []
    if offset:
        parts.append(jnp.zeros((offset,) + rows.shape[1:], dtype=rows.dtype))
    parts.append(rows)
    below = total - offset - rows.shape[0]
    if below:
        parts.append(jnp.zeros((below,) + rows.shape[1:], dtype=rows.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def mont_mul_body(a, b, spec: FieldSpec):
    """Montgomery product a*b*2^-256 mod N on (NLIMBS8, B) canonical limbs.

    Three 8-bit convolutions, all products and column sums exact in f32:
    - T = a*b: 64 columns, each <= 32 * 255 * 256 < 2^21.
    - m = (T mod 2^256) * N' mod 2^256: low 32 columns only; T's limbs are
      2-pass folded (<= 255 + 2^8 <= 512; 512 * 255 * 32 < 2^22 OK).
    - T + m*N: low half divisible by 2^256; folded with TWO overflow rows
      (its raw value reaches ~2^270), the 32 low rows then hold exactly 0
      or 2^256 (rows <= 256 bound them below 2^256 + 2^250), so the carry
      into the high half is overflow + any-nonzero. High half fully
      normalizes + cond-subtracts. Value-fits-rows arguments guarantee no
      fold ever drops a top-row carry.
    """
    nl, _, nv, _ = _SPEC_INTS8[id(spec)]
    K = 2 * NLIMBS8

    cols = jnp.zeros((K,) + a.shape[1:], dtype=F32)
    for j in range(NLIMBS8):
        cols = cols + _embed_rows(a * b[j][None], j, K)
    t = carry_fold(cols, 2)  # limbs <= 255 + 2^8

    tl = t[:NLIMBS8]
    mcols = jnp.zeros_like(tl)
    for j in range(NLIMBS8):
        if nv[j] == 0:
            continue
        mcols = mcols + _embed_rows(
            tl[: NLIMBS8 - j] * float(nv[j]), j, NLIMBS8
        )
    # m must be canonical (< 2^256 as a VALUE) for the REDC bound
    # hi < 2N; carry_full's top-row carry drops are exactly the mod 2^256
    m = carry_full(mcols)

    mncols = jnp.zeros((K,) + a.shape[1:], dtype=F32)
    for j in range(NLIMBS8):
        if nl[j] == 0:
            continue
        mncols = mncols + _embed_rows(m * float(nl[j]), j, K)
    total = mncols + t  # columns <= 32*512*255 + 512 < 2^23

    low = carry_fold(
        jnp.concatenate([total[:NLIMBS8], jnp.zeros_like(total[:2])],
                        axis=0), 3,
    )
    low_any = jnp.any(low[:NLIMBS8] != 0, axis=0).astype(F32)
    carry = low[NLIMBS8] + low[NLIMBS8 + 1] * BASE + low_any
    hi = jnp.concatenate([(total[NLIMBS8:NLIMBS8 + 1] + carry[None]),
                          total[NLIMBS8 + 1:]], axis=0)
    hi = carry_full(hi)
    return cond_sub_n(hi, spec)


def _mm_kernel(a_ref, b_ref, o_ref, *, spec):
    o_ref[:, :] = mont_mul_body(a_ref[:, :], b_ref[:, :], spec)


def mont_mul(a, b, spec: FieldSpec):
    """Dispatching Montgomery multiply: fused Pallas kernel on TPU for
    lane-aligned batches, plain XLA body otherwise (mirrors
    lmfield.mont_mul)."""
    from functools import partial

    from . import lmfield as lf

    if (lf.use_pallas() and a.ndim == 2 and a.shape == b.shape
            and a.shape[1] % 512 == 0):
        return _mont_mul_pallas(a, b, id(spec))
    return mont_mul_body(a, b, spec)


def _mont_mul_pallas(a, b, spec_id):
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = FQ if spec_id == id(FQ) else FR
    bs = pl.BlockSpec((NLIMBS8, 512), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    return jax.jit(
        lambda x, y: pl.pallas_call(
            partial(_mm_kernel, spec=spec),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(x.shape[1] // 512,),
            in_specs=[bs, bs],
            out_specs=bs,
        )(x, y)
    )(a, b)


def expand16_to8(x_u32):
    """(16, B) uint32 16-bit limbs -> (32, B) float32 8-bit limbs. Runs in
    XLA (outside Pallas kernels) where integer<->float casts lower freely."""
    lo = (x_u32 & 0xFF).astype(jnp.int32).astype(F32)
    hi = ((x_u32 >> 8) & 0xFF).astype(jnp.int32).astype(F32)
    return jnp.concatenate(
        [lo[:, None], hi[:, None]], axis=1
    ).reshape(2 * x_u32.shape[0], *x_u32.shape[1:])
