"""Device field kernels vs the exact host oracle (limb arithmetic unit
tests; SURVEY.md §4 'limb arithmetic vs python-int ground truth')."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_verifier_tpu.ops import field_jax as fj
from halo2_verifier_tpu.ops.constants import P, R
from halo2_verifier_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(1234)


def _rand_batch(modulus, n=64):
    vals = [rng.randrange(modulus) for _ in range(n - 4)] + [
        0, 1, modulus - 1, modulus - 2
    ]
    return vals


@pytest.mark.parametrize("spec,modulus", [(fj.FR, R), (fj.FQ, P)])
def test_add_sub_neg(spec, modulus):
    a = _rand_batch(modulus)
    b = list(reversed(_rand_batch(modulus)))
    A = jnp.asarray(ints_to_limbs(a))
    B = jnp.asarray(ints_to_limbs(b))
    got = limbs_to_ints(np.asarray(fj.add(A, B, spec)))
    assert got == [(x + y) % modulus for x, y in zip(a, b)]
    got = limbs_to_ints(np.asarray(fj.sub(A, B, spec)))
    assert got == [(x - y) % modulus for x, y in zip(a, b)]
    got = limbs_to_ints(np.asarray(fj.neg(A, spec)))
    assert got == [(-x) % modulus for x in a]


@pytest.mark.parametrize("spec,modulus", [(fj.FR, R), (fj.FQ, P)])
def test_mont_mul_roundtrip(spec, modulus):
    a = _rand_batch(modulus)
    b = list(reversed(_rand_batch(modulus)))
    A = fj.to_mont(jnp.asarray(ints_to_limbs(a)), spec)
    B = fj.to_mont(jnp.asarray(ints_to_limbs(b)), spec)
    got = limbs_to_ints(np.asarray(fj.from_mont(fj.mont_mul(A, B, spec), spec)))
    assert got == [x * y % modulus for x, y in zip(a, b)]
    # to/from mont roundtrip
    back = limbs_to_ints(np.asarray(fj.from_mont(A, spec)))
    assert back == a


def test_inv_mont():
    a = _rand_batch(R, 32)
    A = fj.to_mont(jnp.asarray(ints_to_limbs(a)), fj.FR)
    inv = limbs_to_ints(np.asarray(fj.from_mont(fj.inv_mont(A, fj.FR), fj.FR)))
    for x, ix in zip(a, inv):
        if x == 0:
            assert ix == 0
        else:
            assert x * ix % R == 1


def test_pow_fixed():
    a = _rand_batch(R, 16)
    A = fj.to_mont(jnp.asarray(ints_to_limbs(a)), fj.FR)
    e = 0xDEADBEEF12345
    got = limbs_to_ints(np.asarray(fj.from_mont(fj.pow_fixed(A, e, fj.FR), fj.FR)))
    assert got == [pow(x, e, R) for x in a]


def test_exhaustive_small_products():
    """Stress the carry paths with adversarial limb patterns."""
    pats = [0, 1, R - 1, (1 << 255) % R, int("f" * 60, 16) % R,
            0xFFFF, 0x10000, (1 << 240) % R]
    pairs = [(x, y) for x in pats for y in pats]
    A = fj.to_mont(jnp.asarray(ints_to_limbs([x for x, _ in pairs])), fj.FR)
    B = fj.to_mont(jnp.asarray(ints_to_limbs([y for _, y in pairs])), fj.FR)
    got = limbs_to_ints(np.asarray(fj.from_mont(fj.mont_mul(A, B, fj.FR), fj.FR)))
    assert got == [x * y % R for x, y in pairs]
