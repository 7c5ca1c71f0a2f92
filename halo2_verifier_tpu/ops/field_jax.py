"""Vectorized modular (Montgomery) arithmetic for BN254 Fq/Fr on TPU.

TPU-native design notes (this is the framework's innermost compute layer):
- elements are (..., 16) uint32 arrays of 16-bit limbs (ops/limbs.py); every
  operation is elementwise/branchless over the leading batch axes, so the
  VPU vectorizes across the *batch* — the verifier workload is
  throughput-shaped (thousands of independent field ops per proof batch);
- limb products are exact in uint32; convolution columns accumulate 16-bit
  halves (bound 32*2^16 < 2^22), carries propagate in short unrolled chains;
- no data-dependent control flow: identity/equal-point/underflow cases are
  handled by arithmetic selects, keeping everything jit/shard_map friendly.

The reference inherits this layer from halo2curves (arithmetic.rs:1-3);
here it is built from scratch for the TPU execution model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .constants import MONT_R_FQ, MONT_R_FR, P, R
from .limbs import LIMB_BITS, MASK, NLIMBS, int_to_limbs

U32 = jnp.uint32


class FieldSpec:
    """Per-modulus constants for the device kernels."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.mont_r = (1 << 256) % modulus
        self.mont_r2 = self.mont_r * self.mont_r % modulus
        # -modulus^{-1} mod 2^256 (full-width for the low-half product step)
        self.ninv = (-pow(modulus, -1, 1 << 256)) % (1 << 256)
        self.n_limbs = jnp.asarray(int_to_limbs(modulus), dtype=U32)
        self.ninv_limbs = jnp.asarray(int_to_limbs(self.ninv), dtype=U32)
        self.r_limbs = jnp.asarray(int_to_limbs(self.mont_r), dtype=U32)
        self.r2_limbs = jnp.asarray(int_to_limbs(self.mont_r2), dtype=U32)
        self.zero = jnp.zeros(NLIMBS, dtype=U32)
        # exponent bits (LSB first) for Fermat inversion
        e = modulus - 2
        self.inv_exp_bits = jnp.asarray(
            [(e >> i) & 1 for i in range(256)], dtype=U32
        )
        # sqrt exponent (q+1)/4 for q = 3 mod 4 (BN254 Fq): the principal
        # root of a QR; used by the device G1-decompression pre-pass
        if modulus % 4 == 3:
            s = (modulus + 1) // 4
            self.sqrt_exp_bits = jnp.asarray(
                [(s >> i) & 1 for i in range(256)], dtype=U32
            )
        else:
            self.sqrt_exp_bits = None


FQ = FieldSpec(P)
FR = FieldSpec(R)


def _carry_reduce(cols, out_limbs):
    """Propagate carries through uint32 columns -> 16-bit limbs.

    cols: (..., K) uint32 with column values < 2^32 - slack.
    Returns (..., out_limbs) plus the final carry column.
    """
    limbs = []
    carry = jnp.zeros_like(cols[..., 0])
    for k in range(out_limbs):
        c = cols[..., k] + carry
        limbs.append(c & MASK)
        carry = c >> LIMB_BITS
    return jnp.stack(limbs, axis=-1), carry


def _mul_columns(a, b, num_cols):
    """Column sums of the limb product a*b, split into 16-bit halves so no
    uint32 overflow is possible. Returns (..., num_cols) uint32 columns
    (each < 33 * 2^16).

    Structured as L shifted slice-adds (one per limb of b) rather than an
    L*L unrolled accumulation — ~8x fewer HLO ops, which matters for both
    compile time and VPU scheduling.
    """
    L = a.shape[-1]
    Lb = b.shape[-1]
    a_b = jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape[:-1] + (L,)))
    cols = jnp.zeros(a_b.shape[:-1] + (num_cols + 1,), dtype=U32)
    for j in range(Lb):
        prod = a_b * b[..., j:j + 1]
        lo = prod & MASK
        hi = prod >> LIMB_BITS
        nlo = min(L, num_cols - j)
        if nlo > 0:
            cols = cols.at[..., j: j + nlo].add(lo[..., :nlo])
        nhi = min(L, num_cols - j - 1)
        if nhi > 0:
            cols = cols.at[..., j + 1: j + 1 + nhi].add(hi[..., :nhi])
    return cols[..., :num_cols]


def _geq(a, b):
    """a >= b over limb vectors, branchless lexicographic compare."""
    gt = a > b
    lt = a < b
    # scan from most-significant limb
    result = jnp.zeros_like(a[..., 0], dtype=jnp.bool_)
    decided = jnp.zeros_like(result)
    for k in range(a.shape[-1] - 1, -1, -1):
        result = jnp.where(~decided & gt[..., k], True, result)
        decided = decided | gt[..., k] | lt[..., k]
    return result | ~decided  # equal -> True


def _sub_limbs(a, b):
    """a - b with borrow chain; returns (diff, borrow_out in {0,1})."""
    limbs = []
    borrow = jnp.zeros_like(a[..., 0])
    for k in range(a.shape[-1]):
        d = a[..., k] - b[..., k] - borrow
        limbs.append(d & MASK)
        borrow = (d >> 31) & 1  # underflow wraps into the top bit region
    return jnp.stack(limbs, axis=-1), borrow


def _cond_sub_modulus(x, spec: FieldSpec):
    """x - N if x >= N else x (x < 2N)."""
    diff, borrow = _sub_limbs(x, jnp.broadcast_to(spec.n_limbs, x.shape))
    return jnp.where((borrow == 0)[..., None], diff, x)


def add(a, b, spec: FieldSpec):
    cols = a + b
    s, _ = _carry_reduce(cols, NLIMBS)
    return _cond_sub_modulus(s, spec)


def sub(a, b, spec: FieldSpec):
    diff, borrow = _sub_limbs(a, b)
    n_add = jnp.where((borrow == 1)[..., None], spec.n_limbs, 0).astype(U32)
    s, _ = _carry_reduce(diff + n_add, NLIMBS)
    return s


def neg(a, spec: FieldSpec):
    """-a mod N (0 -> 0)."""
    diff, _ = _sub_limbs(jnp.broadcast_to(spec.n_limbs, a.shape), a)
    return jnp.where(is_zero(a)[..., None], a, diff)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product ab * 2^-256 mod N.

    Three-convolution form (full product, low-half m = T*N' mod 2^256,
    full m*N), all exact in uint32 columns. Inputs reduced (< N); output
    reduced.
    """
    # T = a * b, kept as 32 carried 16-bit limbs
    t_cols = _mul_columns(a, b, 32)
    t, t_top = _carry_reduce(t_cols, 32)
    # m = (T mod 2^256) * ninv mod 2^256 — only the low 16 columns matter
    m_cols = _mul_columns(t[..., :NLIMBS], spec.ninv_limbs, NLIMBS)
    m, _ = _carry_reduce(m_cols, NLIMBS)
    # T + m*N is divisible by 2^256; result = (T + m*N) >> 256
    mn_cols = _mul_columns(m, spec.n_limbs, 32)
    total_cols = mn_cols + t  # t is carried limbs < 2^16 -> safe add
    _, carry = _carry_reduce(total_cols[..., :NLIMBS], NLIMBS)
    # the low 256 bits of T + m*N are zero by construction; only the carry
    # out of them survives into the high half
    hi_cols = total_cols[..., NLIMBS:]
    hi_cols = hi_cols.at[..., 0].add(carry)
    hi, _ = _carry_reduce(hi_cols, NLIMBS)
    # (T + m*N) / 2^256 < N^2/2^256 + N < 2N: one conditional subtract
    # (t_top and the final reduce carry are provably zero at these bounds)
    return _cond_sub_modulus(hi, spec)


def to_mont(a, spec: FieldSpec):
    return mont_mul(a, jnp.broadcast_to(spec.r2_limbs, a.shape), spec)


def from_mont(a, spec: FieldSpec):
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one, spec)


def mont_one(spec: FieldSpec, shape=()):
    return jnp.broadcast_to(spec.r_limbs, shape + (NLIMBS,)).astype(U32)


def mont_square(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def select(cond, a, b):
    """cond ? a : b with cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


def inv_mont(a, spec: FieldSpec):
    """Fermat inversion a^(N-2) in Montgomery form via lax.scan (keeps the
    compiled graph one mont_mul deep). inv(0) = 0."""

    def body(carry, bit):
        result, base = carry
        mul = mont_mul(result, base, spec)
        result = select(jnp.broadcast_to(bit == 1, result.shape[:-1]),
                        mul, result)
        base = mont_mul(base, base, spec)
        return (result, base), None

    init = (mont_one(spec, a.shape[:-1]), a)
    (result, _), _ = jax.lax.scan(body, init, spec.inv_exp_bits)
    return select(is_zero(a), a, result)


def pow_fixed(a, exponent: int, spec: FieldSpec):
    """a^e for a static exponent, square-and-multiply under scan."""
    nbits = max(exponent.bit_length(), 1)
    bits = jnp.asarray([(exponent >> i) & 1 for i in range(nbits)], dtype=U32)

    def body(carry, bit):
        result, base = carry
        mul = mont_mul(result, base, spec)
        result = select(jnp.broadcast_to(bit == 1, result.shape[:-1]),
                        mul, result)
        base = mont_mul(base, base, spec)
        return (result, base), None

    init = (mont_one(spec, a.shape[:-1]), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result
