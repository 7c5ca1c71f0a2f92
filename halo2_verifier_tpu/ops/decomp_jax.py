"""Device G1-decompression pre-pass: batched principal square roots.

Halo2 proofs carry compressed G1 points (x with a sign bit,
helpers.rs:33-65); decompression needs y = sqrt(x^3 + 3), a ~381-mul
Fermat pow per point — by far the largest share of the host replay VM's
field work (~15 points/proof on the k=14 workload). The transcript read
SCHEDULE is vk-static, so every proof point's x coordinate sits at a
known byte offset: the host gathers all (proof, point) x's up front
(CompiledReplay.gather_point_xs), this module computes the principal
roots y0 = (x^3+3)^((q+1)/4) for the whole batch in one device dispatch
(vectorized 16-bit-limb Montgomery arithmetic, lax.scan over exponent
bits), and the VM then just CHECKS y0^2 == x^3+3 and applies the sign
bit (~5 muls, native/replayvm.cpp check_point_ext). A wrong y0 rejects
the proof exactly like a failed sqrt, so soundness never depends on the
device result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lmfield as lf
from ..utils.aotcache import aot_jit
from .constants import P
from .field_jax import FQ
from .limbs import NLIMBS, int_to_limbs

_B_MONT = jnp.asarray(int_to_limbs(3 * FQ.mont_r % P), dtype=jnp.uint32)
_ONE = jnp.asarray(int_to_limbs(1), dtype=jnp.uint32)

# pad widths quantize to this so one compiled kernel serves a batch-size
# range (the scan kernel compiles once per width class)
PAD_GRAN = 1024


def _pow_bits(a, bits, spec):
    """a^e in Montgomery form, e given as LSB-first bit array (static)."""

    def body(carry, bit):
        result, base = carry
        mul = lf.mont_mul_body(result, base, spec)
        result = jnp.where(bit == 1, mul, result)
        base = lf.mont_mul_body(base, base, spec)
        return (result, base), None

    init = (lf.mont_one(spec, a.shape[1]), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


@aot_jit
def _y_principal(xs):
    """(NLIMBS, B) canonical x limbs -> (NLIMBS, B) canonical principal
    roots y0 = (x^3+3)^((q+1)/4). For non-residue x^3+3 (or x not a valid
    coordinate) the result fails the VM's y0^2 check."""
    b = xs.shape[1]
    r2 = jnp.broadcast_to(FQ.r2_limbs.reshape(NLIMBS, 1), (NLIMBS, b))
    xm = lf.mont_mul(xs, r2, FQ)
    x2 = lf.mont_mul(xm, xm, FQ)
    x3 = lf.mont_mul(x2, xm, FQ)
    rhs = lf.add(
        x3, jnp.broadcast_to(_B_MONT.reshape(NLIMBS, 1), (NLIMBS, b)), FQ
    )
    y = _pow_bits(rhs, FQ.sqrt_exp_bits, FQ)
    one = jnp.broadcast_to(_ONE.reshape(NLIMBS, 1), (NLIMBS, b))
    return lf.mont_mul(y, one, FQ)  # from Montgomery


def dispatch_y_batch(x_limbs_np):
    """(M, NLIMBS) uint32 canonical x limbs -> async device array
    (NLIMBS, pad) of canonical principal roots. No host sync here —
    fetch with np.asarray and pack via CompiledReplay.pack_ext_y."""
    m = x_limbs_np.shape[0]
    pad = max(-(-m // PAD_GRAN) * PAD_GRAN, PAD_GRAN)
    xs = np.zeros((NLIMBS, pad), dtype=np.uint32)
    xs[:, :m] = x_limbs_np.T
    return _y_principal(jnp.asarray(xs))
