"""Limbs-major Montgomery field arithmetic + Pallas TPU kernels.

Shape convention: a batch of field elements is a (NLIMBS=16, B) uint32 array
of 16-bit limbs with the LIMB axis LEADING ("limbs-major"). Why: the TPU VPU
tiles (8 sublanes x 128 lanes); with the batch on the lane axis, whole-element
operations (limb products against a broadcast row, carry passes, conditional
subtracts) are full-tile (16, B) vector ops at 100% lane utilization, and the
whole Montgomery multiply is ~100 *large* ops instead of ~650 row-sized ones.

Two execution modes share one implementation:
- the `*_body` functions are pure jnp and run under plain XLA anywhere (CPU
  tests, tiny batches);
- on TPU, `mont_mul` dispatches to a Pallas kernel wrapping the same body, so
  the entire dataflow (3 convolutions, carry propagation, conditional
  subtract) stays in VMEM and each operand touches HBM exactly once.
  Measured on the XLA elementwise path a stacked 786k-element multiply cost
  ~30 ms (memory-bound on ~650 materialized intermediates); the kernel's
  traffic bound is ~0.2 ms.

The reference inherits all field arithmetic from halo2curves
(arithmetic.rs:1-3); this layer is the TPU-native replacement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .field_jax import FQ, FR, FieldSpec
from .limbs import LIMB_BITS, MASK, NLIMBS

U32 = jnp.uint32
_MASK = jnp.uint32(MASK)

# Pallas lane-block: each kernel instance handles (NLIMBS, BLOCK_B) limbs.
BLOCK_B = 1024


def _spec_cols(spec: FieldSpec):
    """Per-spec (NLIMBS, 1) constant columns for broadcasting over lanes."""
    n = np.asarray(spec.n_limbs).reshape(NLIMBS, 1)
    comp = (MASK - n).astype(np.uint32)
    return (
        jnp.asarray(n, dtype=U32),
        jnp.asarray(comp, dtype=U32),
        jnp.asarray(np.asarray(spec.r_limbs).reshape(NLIMBS, 1), dtype=U32),
    )


_SPEC_COLS = {id(FQ): _spec_cols(FQ), id(FR): _spec_cols(FR)}


def _spec_ints(spec: FieldSpec):
    """Per-spec Python-int limb constants. Bodies use ONLY these (plus
    scalar literals) so they trace inside Pallas kernels without captured
    array constants (pallas_call rejects closed-over arrays)."""
    nl = [int(v) for v in np.asarray(spec.n_limbs)]
    comp = [MASK - v for v in nl]
    nv = [int(v) for v in np.asarray(spec.ninv_limbs)]
    return nl, comp, nv


_SPEC_INTS = {id(FQ): _spec_ints(FQ), id(FR): _spec_ints(FR)}


def _shift_rows_down(x):
    """Carry shift: row k -> row k+1; row 0 zero-filled, top row dropped."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def carry_prop_static(x):
    """Branch-free exact carry propagation of uint32 columns to 16-bit
    limbs: two shift-fold passes bring EVERY u32 value to <= 2^16 (pass 1:
    <= 65535 + 65535; pass 2: <= 65535 + 1), then a Kogge-Stone
    generate/propagate scan resolves the residual +1 ripple (the
    value-65536 rows) exactly in ceil(log2(rows)) boolean steps. No
    data-dependent while_loop, no cross-lane reductions — everything is a
    full-tile vector op, which is what the Pallas kernels want. Exactness
    is tested against the fold-to-fixpoint oracle on adversarial ripple
    chains (tests/test_lm_kernels.py)."""
    for _ in range(2):
        x = (x & MASK) + _shift_rows_down(x >> LIMB_BITS)
    # x <= 65536: value = r + 2^16 * g with r <= 65535, g in {0, 1}
    r = x & MASK
    # carry INTO row k: c_k = g_{k-1} | (p_{k-1} & c_{k-1})
    G = _shift_rows_down(x >> LIMB_BITS)
    P = _shift_rows_down((r == MASK).astype(U32))
    rows = x.shape[0]
    d = 1
    while d < rows:
        zG = jnp.concatenate([jnp.zeros_like(G[:d]), G[:-d]], axis=0)
        zP = jnp.concatenate([jnp.zeros_like(P[:d]), P[:-d]], axis=0)
        G = G | (P & zG)
        P = P & zP
        d *= 2
    return (r + G) & MASK


def carry_prop_loop(x):
    """Fold-to-fixpoint carry propagation (compact graph: one while_loop
    node). Semantically identical to carry_prop_static; preferred off-TPU
    because XLA-CPU compile time scales with unrolled graph size."""

    def cond(x):
        return jnp.any(x >> LIMB_BITS)

    def body(x):
        return (x & MASK) + _shift_rows_down(x >> LIMB_BITS)

    return jax.lax.while_loop(cond, body, x)


def carry_prop(x):
    """Exact carry propagation of uint32 columns to 16-bit limbs. Carries
    out of the top row are dropped — callers size the row count so the true
    carry is zero, or keep an explicit overflow row.

    Two equivalent implementations: the static unrolled form executes
    faster on TPU (no per-pass cross-lane any() reduction); the while_loop
    form compiles ~3x faster on CPU where tests run. H2V_STATIC_CARRY=0/1
    overrides the backend-based choice (the CPU test suite pins =1 on a
    subset to cover the static path)."""
    import os

    flag = os.environ.get("H2V_STATIC_CARRY")
    if flag is not None:
        return carry_prop_static(x) if flag != "0" else carry_prop_loop(x)
    return carry_prop_static(x) if use_pallas() else carry_prop_loop(x)


def _with_overflow_row(x):
    return jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)


def _embed_rows(rows, offset: int, total: int):
    """Place `rows` at row `offset` of a `total`-row zero array. Pure
    concatenation — Pallas TPU has no scatter, so column accumulations are
    expressed as full-width adds of embedded slabs."""
    parts = []
    if offset:
        parts.append(jnp.zeros((offset,) + rows.shape[1:], dtype=rows.dtype))
    parts.append(rows)
    below = total - offset - rows.shape[0]
    if below:
        parts.append(jnp.zeros((below,) + rows.shape[1:], dtype=rows.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _bump_row0(x, inc):
    """x with `inc` added to row 0 (concat form; no scatter)."""
    return jnp.concatenate([(x[:1] + inc), x[1:]], axis=0)


def cond_sub_n(x, spec: FieldSpec):
    """x - N if x >= N else x, for carried x < 2N (branchless).

    Adds the 16-bit complement of N plus one (i.e. subtracts N mod 2^256)
    with an explicit overflow row; the overflow bit IS the x >= N predicate.
    """
    _, comp, _ = _SPEC_INTS[id(spec)]
    t = jnp.stack(
        [x[k] + jnp.uint32(comp[k] + (k == 0)) for k in range(NLIMBS)]
    )
    t = carry_prop(_with_overflow_row(t))
    ge = t[NLIMBS] > 0
    return jnp.where(ge[None], t[:NLIMBS], x)


def add_body(a, b, spec: FieldSpec):
    return cond_sub_n(carry_prop(a + b), spec)


def sub_body(a, b, spec: FieldSpec):
    nl, _, _ = _SPEC_INTS[id(spec)]
    # a - b + 2^256 via complement add; overflow row = "no borrow"
    t = _bump_row0(a + (MASK - b), 1)
    t = carry_prop(_with_overflow_row(t))
    no_borrow = t[NLIMBS] > 0
    zero = jnp.uint32(0)
    r = jnp.stack([
        t[k] + jnp.where(no_borrow, zero, jnp.uint32(nl[k]))
        for k in range(NLIMBS)
    ])
    return carry_prop(r)


def is_zero(a):
    return jnp.all(a == 0, axis=0)


def eq(a, b):
    return jnp.all(a == b, axis=0)


def select(cond, a, b):
    """cond ? a : b with cond shaped like the lane/batch axes."""
    return jnp.where(cond[None, ...], a, b)


def mont_one(spec: FieldSpec, b: int):
    _, _, r = _SPEC_COLS[id(spec)]
    return jnp.broadcast_to(r, (NLIMBS, b)).astype(U32)


def neg_body(a, spec: FieldSpec):
    return sub_body(jnp.zeros_like(a), a, spec)


def carry_fold2(x):
    """Two shift-fold passes: any u32 columns -> limbs <= 2^16 (pass 1:
    <= 65535+65535, pass 2: <= 65535+1). NOT fully canonical (a limb may be
    exactly 65536 = 2^16), but the represented value is unchanged, and
    products limb * v with v <= 65535 still fit u32 (65536*65535 < 2^32) —
    sufficient for feeding another convolution."""
    for _ in range(2):
        x = (x & MASK) + _shift_rows_down(x >> LIMB_BITS)
    return x


# ------------------------------------------------- MXU constant-conv path
#
# Montgomery reduction multiplies by CONSTANTS twice per product: m =
# T_lo * N' mod 2^256 and then m * N. A multiply-by-constant convolution
# is a matrix-vector product per lane — out[k] = sum_i x[i] * c[k-i] —
# i.e. a matmul against a constant banded matrix. In 8-bit digits every
# operand is exact in bfloat16 (ints <= 256) and every accumulated column
# is exact in the MXU's f32 accumulation (<= 32 * 256 * 255 < 2^22 <
# 2^24), so two of the three convolutions move off the VPU (the issue-
# bound unit for this workload) onto the otherwise-idle MXU. The a*b
# convolution has no constant operand and stays on the VPU.

def _spec_bytemats(spec: FieldSpec):
    """Constant banded byte matrices: W2 (32,32) for x*N' mod 2^256 and
    W3 (64,32) for the full x*N, both over interleaved lo/hi byte digits
    (digit 2i = limb i & 0xFF, digit 2i+1 = limb i >> 8)."""
    nl, _, nv = _SPEC_INTS[id(spec)]

    def bytes_of(limbs):
        out = []
        for v in limbs:
            out.extend((v & 0xFF, v >> 8))
        return out

    nb, vb = bytes_of(nl), bytes_of(nv)
    w3 = np.zeros((2 * K_BYTES, K_BYTES), np.float32)
    w2 = np.zeros((K_BYTES, K_BYTES), np.float32)
    for i in range(K_BYTES):
        for j in range(K_BYTES):
            w3[i + j, i] = nb[j]
            if i + j < K_BYTES:
                w2[i + j, i] = vb[j]
    return w2, w3


K_BYTES = 2 * NLIMBS
_SPEC_BYTEMATS = {}


def _bytemats(spec: FieldSpec):
    mats = _SPEC_BYTEMATS.get(id(spec))
    if mats is None:
        mats = _spec_bytemats(spec)
        _SPEC_BYTEMATS[id(spec)] = mats
    return mats


def _byte_digits(x):
    """(NLIMBS, ...) u32 limbs <= 2^16 -> (2*NLIMBS, ...) interleaved lo/hi
    byte digits (hi may be exactly 256 for the non-canonical 2^16 limb —
    still bf16-exact)."""
    lo = x & jnp.uint32(0xFF)
    hi = x >> 8
    return jnp.stack([lo, hi], axis=1).reshape(
        (2 * x.shape[0],) + x.shape[1:]
    )


def _mxu_conv_const(x16, w_np):
    """Exact multiply-by-constant convolution on the MXU: byte digits in
    bf16, f32 accumulation, result columns < 2^22 returned as u32."""
    d = _byte_digits(x16).astype(jnp.bfloat16)
    w = jnp.asarray(w_np, dtype=jnp.bfloat16)
    out = jax.lax.dot_general(
        w, d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(U32)


def _recombine_bytes(cols8):
    """(2K, ...) byte-weighted columns -> (K, ...) 16-bit-weighted columns
    (col k = b[2k] + 256*b[2k+1]; bound 2^22 + 2^30 fits u32)."""
    return cols8[0::2] + (cols8[1::2] << 8)


def _mxu_enabled() -> bool:
    """Default OFF: measured on a real v5e chip the MXU variant is 0.81x
    the classic VPU body (benchmarks/prof_point_add.py, batch 131072 —
    the 32-deep contractions underutilize the 128x128 systolic array and
    the digit converts/recombines eat the VPU savings). Kept env-gated
    (H2V_MONT_MXU=1) as an exact, tested alternative for future hardware
    where the trade flips."""
    import os

    return os.environ.get("H2V_MONT_MXU") == "1"


def mont_mul_body(a, b, spec: FieldSpec):
    """Montgomery product a*b*2^-256 mod N on (NLIMBS, B) carried limbs.

    Mirrors ops/field_jax.mont_mul (three convolutions) but with whole-
    element column updates: each of the 16 partial-product steps is one
    (16, B) multiply against a broadcast limb row plus two shifted column
    adds — every op full-width. Column bound 32*2^16 < 2^21, exact in u32.

    Carry discipline: the t and m intermediates only feed further
    convolutions, so the cheap 2-pass fold (limbs <= 2^16, see carry_fold2)
    suffices — products stay in u32 and values mod 2^256 are position-
    weighted sums, indifferent to the redundancy. Only the final result is
    fully normalized. For the low half of T + mN (divisible by 2^256): after
    a 2-pass fold with an overflow row, the 16 low rows hold a value
    <= 16 * 2^16 * 2^240 < 2^256 + 2^241 that is still divisible by 2^256 —
    i.e. exactly 0 or exactly 2^256 — so the total carry into the high half
    is the overflow row plus an any-nonzero test, with no full carry
    completion.
    """
    nl, _, nv = _SPEC_INTS[id(spec)]
    K = 2 * NLIMBS

    # T = a*b: 32 columns (i+j <= 30 for lo terms, <= 31 for hi terms).
    # lo and hi halves combine into ONE 17-row slab before embedding, so
    # each j costs one (17,B) add + one (32,B) add instead of two (32,B)
    # embed-adds. Slab bound: lo + hi <= 2*65535 per row, x16 terms < 2^21.
    cols = jnp.zeros((K,) + a.shape[1:], dtype=U32)
    zrow = jnp.zeros((1,) + a.shape[1:], dtype=U32)
    for j in range(NLIMBS):
        prod = a * b[j][None]
        slab = (
            jnp.concatenate([prod & MASK, zrow])
            + jnp.concatenate([zrow, prod >> LIMB_BITS])
        )
        cols = cols + _embed_rows(slab, j, K)
    t = carry_fold2(cols)

    if _mxu_enabled():
        # constant-operand convolutions on the MXU (see _spec_bytemats):
        # m = T_lo * N' mod 2^256, then m * N — VPU only folds/recombines
        w2, w3 = _bytemats(spec)
        mc = _mxu_conv_const(t[:NLIMBS], w2)        # (32,) byte cols <2^22
        m = carry_fold2(_recombine_bytes(mc))       # limbs <= 2^16
        mncols = _recombine_bytes(_mxu_conv_const(m, w3))  # (32,) <2^31
        total = mncols + t
        low = carry_fold2(_with_overflow_row(total[:NLIMBS]))
        carry = low[NLIMBS] + jnp.any(
            low[:NLIMBS] != 0, axis=0).astype(U32)
        hi = _bump_row0(total[NLIMBS:], carry[None])
        hi = carry_prop(hi)
        return cond_sub_n(hi, spec)

    # m = (T mod 2^256) * N' mod 2^256 — low 16 columns only
    tl = t[:NLIMBS]
    mcols = jnp.zeros_like(tl)
    for j in range(NLIMBS):
        if nv[j] == 0:
            continue
        prod = tl[: NLIMBS - j] * jnp.uint32(nv[j])
        mcols = mcols + _embed_rows(prod & MASK, j, NLIMBS)
        if j + 1 < NLIMBS:
            mcols = mcols + _embed_rows(
                (prod >> LIMB_BITS)[: NLIMBS - j - 1], j + 1, NLIMBS
            )
    m = carry_fold2(mcols)  # top carries dropped = mod 2^256

    # T + m*N: low half's carry into the high half via the any-nonzero test
    mncols = jnp.zeros((K,) + a.shape[1:], dtype=U32)
    for j in range(NLIMBS):
        if nl[j] == 0:
            continue
        prod = m * jnp.uint32(nl[j])
        slab = (
            jnp.concatenate([prod & MASK, zrow])
            + jnp.concatenate([zrow, prod >> LIMB_BITS])
        )
        mncols = mncols + _embed_rows(slab, j, K)
    total = mncols + t  # t folded (<= 2^16): no u32 overflow
    low = carry_fold2(_with_overflow_row(total[:NLIMBS]))
    carry = low[NLIMBS] + jnp.any(low[:NLIMBS] != 0, axis=0).astype(U32)
    hi = _bump_row0(total[NLIMBS:], carry[None])
    hi = carry_prop(hi)
    return cond_sub_n(hi, spec)


# --------------------------------------------------------------- dispatch

def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


# Pallas kernels run on real TPU backends (incl. the tunneled 'axon'
# platform); anything else uses the XLA body directly.
_PALLAS_BACKENDS = ("tpu", "axon")


def use_pallas() -> bool:
    import os

    if os.environ.get("H2V_DISABLE_PALLAS"):
        return False
    return _backend() in _PALLAS_BACKENDS


def _pad_lanes(x, mult):
    b = x.shape[-1]
    rem = (-b) % mult
    if rem == 0:
        return x, b
    pad = [(0, 0)] * (x.ndim - 1) + [(0, rem)]
    return jnp.pad(x, pad), b


def _mm_kernel(a_ref, b_ref, o_ref, *, spec):
    o_ref[:, :] = mont_mul_body(a_ref[:, :], b_ref[:, :], spec)


@partial(jax.jit, static_argnames=("spec_id",))
def _mont_mul_pallas(a, b, spec_id):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = FQ if spec_id == id(FQ) else FR
    grid = (a.shape[1] // BLOCK_B,)
    bs = pl.BlockSpec((NLIMBS, BLOCK_B), lambda i: (0, i),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_mm_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[bs, bs],
        out_specs=bs,
    )(a, b)


def mont_mul(a, b, spec: FieldSpec):
    """Dispatching Montgomery multiply: Pallas kernel on TPU for large
    lane-aligned batches, plain XLA body otherwise. a, b: (NLIMBS, B)."""
    if (
        use_pallas()
        and a.ndim == 2
        and a.shape == b.shape
        and a.shape[1] % BLOCK_B == 0
    ):
        return _mont_mul_pallas(a, b, id(spec))
    return mont_mul_body(a, b, spec)


def add(a, b, spec: FieldSpec):
    return add_body(a, b, spec)


def sub(a, b, spec: FieldSpec):
    return sub_body(a, b, spec)


def neg(a, spec: FieldSpec):
    return neg_body(a, spec)


def inv_mont(a, spec: FieldSpec):
    """Fermat inversion in Montgomery form (lax.scan over exponent bits);
    inv(0) = 0. Used only on tiny batches (affine conversion of results)."""

    def body(carry, bit):
        result, base = carry
        mul = mont_mul_body(result, base, spec)
        result = jnp.where((bit == 1), mul, result)
        base = mont_mul_body(base, base, spec)
        return (result, base), None

    init = (mont_one(spec, a.shape[1]), a)
    (result, _), _ = jax.lax.scan(body, init, spec.inv_exp_bits)
    return select(is_zero(a), a, result)
