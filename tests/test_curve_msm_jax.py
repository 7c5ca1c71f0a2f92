"""Device curve/MSM kernels vs host oracles."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from halo2_verifier_tpu.ops import curve_jax as cj
from halo2_verifier_tpu.ops import field_jax as fj
from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops import msm_jax
from halo2_verifier_tpu.ops.constants import G1_GEN, P, R
from halo2_verifier_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

rng = random.Random(99)


def _to_mont_pts(points):
    xs = [0 if p is None else p[0] * fj.FQ.mont_r % P for p in points]
    ys = [0 if p is None else p[1] * fj.FQ.mont_r % P for p in points]
    return (
        jnp.asarray(ints_to_limbs(xs)),
        jnp.asarray(ints_to_limbs(ys)),
    )


def _from_device(pt):
    x, y = cj.to_affine_batch(pt)
    xs = limbs_to_ints(np.asarray(fj.from_mont(x, fj.FQ)))
    ys = limbs_to_ints(np.asarray(fj.from_mont(y, fj.FQ)))
    return [
        None if (a == 0 and b == 0) else (a, b) for a, b in zip(xs, ys)
    ]


def test_complete_add_cases():
    a = hc.g1_mul(G1_GEN, 123)
    b = hc.g1_mul(G1_GEN, 456)
    cases = [
        (a, b),            # generic
        (a, a),            # doubling through add
        (a, hc.g1_neg(a)),  # inverse -> identity
        (a, None),         # identity rhs
        (None, b),         # identity lhs
        (None, None),      # both identity
    ]
    X1, Y1 = _to_mont_pts([c[0] for c in cases])
    X2, Y2 = _to_mont_pts([c[1] for c in cases])
    got = _from_device(cj.add(cj.from_affine(X1, Y1), cj.from_affine(X2, Y2)))
    expected = [hc.g1_add(x, y) for x, y in cases]
    assert got == expected


def test_complete_double():
    pts = [G1_GEN, hc.g1_mul(G1_GEN, 789), None]
    X, Y = _to_mont_pts(pts)
    got = _from_device(cj.double(cj.from_affine(X, Y)))
    assert got == [hc.g1_double(p) for p in pts]


@pytest.mark.parametrize("n", [
    pytest.param(1, marks=pytest.mark.heavy_compile),
    pytest.param(7, marks=pytest.mark.heavy_compile),
    64,
])
def test_msm_matches_host(n):
    scalars = [rng.randrange(R) for _ in range(n)]
    points = [hc.g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    if n >= 7:
        scalars[0] = 0            # zero scalar
        points[1] = None          # identity point
        scalars[2] = R - 1        # max scalar
        points[3] = points[4]     # duplicate points
        scalars[5] = 1
    got = msm_jax.msm_host(scalars, points)
    assert got == hc.g1_msm(scalars, points)
