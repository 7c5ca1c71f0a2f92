"""Limbs-major field/curve kernels (ops/lmfield.py, ops/lmcurve.py) vs the
exact host oracle and the established entries-major device layer."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops import lmcurve as lc
from halo2_verifier_tpu.ops import lmfield as lf
from halo2_verifier_tpu.ops.constants import G1_GEN, P, R
from halo2_verifier_tpu.ops.field_jax import FQ, FR
from halo2_verifier_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(1234)


def _lm(vals):
    """ints -> (NLIMBS, B) limbs-major device array."""
    return jnp.asarray(ints_to_limbs(vals)).T


def _ints(arr):
    return limbs_to_ints(np.asarray(arr).T)


ADVERSARIAL = [0, 1, 2, MASK_CASE := (1 << 16) - 1, (1 << 255) % P, P - 1,
               P - 2, (P + 1) // 2, 0xFFFF_FFFF_FFFF_FFFF]


@pytest.mark.parametrize("spec,modulus", [(FQ, P), (FR, R)])
def test_lm_add_sub_neg(spec, modulus):
    n = 64
    a = [rng.randrange(modulus) for _ in range(n - len(ADVERSARIAL))] + [
        v % modulus for v in ADVERSARIAL
    ]
    b = [rng.randrange(modulus) for _ in range(n)]
    A, B = _lm(a), _lm(b)
    assert _ints(lf.add(A, B, spec)) == [(x + y) % modulus for x, y in zip(a, b)]
    assert _ints(lf.sub(A, B, spec)) == [(x - y) % modulus for x, y in zip(a, b)]
    assert _ints(lf.neg(A, spec)) == [(-x) % modulus for x in a]


@pytest.mark.parametrize("spec,modulus", [(FQ, P), (FR, R)])
def test_lm_mont_mul(spec, modulus):
    n = 64
    a = [rng.randrange(modulus) for _ in range(n)]
    b = [rng.randrange(modulus) for _ in range(n - len(ADVERSARIAL))] + [
        v % modulus for v in ADVERSARIAL
    ]
    rinv = pow(spec.mont_r, -1, modulus)
    got = _ints(lf.mont_mul(_lm(a), _lm(b), spec))
    assert got == [x * y % modulus * rinv % modulus for x, y in zip(a, b)]


def test_lm_inv_mont():
    vals = [0, 1, 2, P - 1] + [rng.randrange(P) for _ in range(12)]
    mont = [v * FQ.mont_r % P for v in vals]
    got = _ints(lf.inv_mont(_lm(mont), FQ))
    for v, g in zip(vals, got):
        expected = 0 if v == 0 else pow(v, -1, P) * FQ.mont_r % P
        assert g == expected


def _to_mont_pts(points):
    xs = [0 if p is None else p[0] * FQ.mont_r % P for p in points]
    ys = [0 if p is None else p[1] * FQ.mont_r % P for p in points]
    return _lm(xs), _lm(ys)


def _from_device_points(proj):
    return lc.to_affine_host(tuple(np.asarray(c) for c in proj))


def test_lm_complete_add_cases():
    a = hc.g1_mul(G1_GEN, 123)
    b = hc.g1_mul(G1_GEN, 456)
    cases = [
        (a, b), (a, a), (a, hc.g1_neg(a)), (a, None), (None, b), (None, None),
    ]
    X1, Y1 = _to_mont_pts([c[0] for c in cases])
    X2, Y2 = _to_mont_pts([c[1] for c in cases])
    got = _from_device_points(
        lc.add(lc.from_affine(X1, Y1), lc.from_affine(X2, Y2))
    )
    assert got == [hc.g1_add(x, y) for x, y in cases]


def test_lm_complete_double():
    pts = [G1_GEN, hc.g1_mul(G1_GEN, 789), None]
    X, Y = _to_mont_pts(pts)
    got = _from_device_points(lc.double(lc.from_affine(X, Y)))
    assert got == [hc.g1_double(p) for p in pts]


def test_lm_matches_entries_major_layer():
    """Differential: new limbs-major mont_mul vs the original (tested)
    entries-major kernel on the same random batch."""
    from halo2_verifier_tpu.ops import field_jax as fj

    n = 32
    a = [rng.randrange(P) for _ in range(n)]
    b = [rng.randrange(P) for _ in range(n)]
    em = fj.mont_mul(
        jnp.asarray(ints_to_limbs(a)), jnp.asarray(ints_to_limbs(b)), FQ
    )
    lm = lf.mont_mul(_lm(a), _lm(b), FQ)
    assert np.array_equal(np.asarray(em).T, np.asarray(lm))


def test_carry_prop_exact_vs_fixpoint_oracle():
    """carry_prop (static passes + Kogge-Stone completion) must equal the
    fold-to-fixpoint oracle on adversarial ripple chains (rows of 65535
    with a pending carry propagate the +1 arbitrarily far)."""
    import numpy as np
    import jax.numpy as jnp
    from halo2_verifier_tpu.ops import lmfield as lf
    from halo2_verifier_tpu.ops.limbs import LIMB_BITS, MASK, NLIMBS

    def oracle(x):
        x = x.astype(np.uint64)
        while (x >> LIMB_BITS).any():
            x = (x & MASK) + np.concatenate(
                [np.zeros_like(x[:1]), x[:-1] >> LIMB_BITS], axis=0
            )
        return x.astype(np.uint32)

    rng = np.random.default_rng(7)
    for rows in (NLIMBS, NLIMBS + 1, 2 * NLIMBS, 2 * NLIMBS + 1):
        for trial in range(50):
            x = rng.integers(0, 1 << 32, size=(rows, 16), dtype=np.uint64)
            x = x.astype(np.uint32)
            ripple = rng.random((rows, 16)) < 0.5
            x[ripple] = 65535
            x[0][rng.random(16) < 0.5] = 0x2FFFF  # force generate + ripple
            want = oracle(x)
            got_s = np.asarray(lf.carry_prop_static(jnp.asarray(x)))
            got_l = np.asarray(lf.carry_prop_loop(jnp.asarray(x)))
            assert np.array_equal(got_s, want), ("static", rows, trial)
            assert np.array_equal(got_l, want), ("loop", rows, trial)
