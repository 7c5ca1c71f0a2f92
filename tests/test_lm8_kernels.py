"""float32 8-bit-limb field backend (ops/lmfield8.py) vs the Python-int
oracle. The full f8 MSM pipeline additionally runs in the TPU bench and in
test_f8_msm_small (guarded: the 32-limb convolution graph compiles slowly
on XLA-CPU; set H2V_RUN_F8_E2E=1 to include it)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from halo2_verifier_tpu.ops import lmfield8 as l8
from halo2_verifier_tpu.ops.constants import P, R
from halo2_verifier_tpu.ops.field_jax import FQ, FR

MONT_R = 1 << 256


def to_arr(vals):
    return jnp.asarray(np.stack([l8.int_to_limbs8(v) for v in vals], axis=1))


def from_arr(a):
    a = np.asarray(a)
    return [l8.limbs8_to_int(a[:, i]) for i in range(a.shape[1])]


@pytest.mark.parametrize("spec,mod", [(FQ, P), (FR, R)], ids=["fq", "fr"])
def test_lmfield8_vs_oracle(spec, mod):
    rng = np.random.default_rng(0)
    B = 64

    def rand():
        v = 1
        for _ in range(5):
            v = v * int(rng.integers(1, 1 << 60)) % mod
        return v

    avals = [rand() for _ in range(B)]
    bvals = [rand() for _ in range(B)]
    # adversarial: identities, wrap-around neighbours, Montgomery one
    avals[:6] = [0, 1, mod - 1, mod - 2, (1 << 256) % mod,
                 ((1 << 256) - 1) % mod]
    bvals[:6] = [0, mod - 1, mod - 1, 1, 2, ((1 << 255) - 1) % mod]
    A, Bv = to_arr(avals), to_arr(bvals)

    got = from_arr(l8.mont_mul_body(A, Bv, spec))
    rinv = pow(MONT_R, -1, mod)
    assert got == [a * b * rinv % mod for a, b in zip(avals, bvals)]
    assert from_arr(l8.add_body(A, Bv, spec)) == [
        (a + b) % mod for a, b in zip(avals, bvals)
    ]
    assert from_arr(l8.sub_body(A, Bv, spec)) == [
        (a - b) % mod for a, b in zip(avals, bvals)
    ]
    assert from_arr(l8.neg_body(A, spec)) == [(-a) % mod for a in avals]


def test_carry_full_vs_mod_oracle():
    """carry_full must equal value mod 2^256 with canonical limbs, on
    adversarial 255-ripple chains."""
    rng = np.random.default_rng(1)

    def val(arr):
        arr = np.asarray(arr, dtype=object)
        return sum(int(arr[k, 0]) << (8 * k) for k in range(arr.shape[0]))

    for trial in range(200):
        x = rng.integers(0, 1 << 22, size=(32, 1)).astype(np.float32)
        if trial % 3 == 1:
            x[rng.random((32, 1)) < 0.5] = 255.0
        if trial % 3 == 2:
            x[:] = 255.0
            x[0] = float(rng.integers(256, 1 << 22))
        v = val(x)
        got = l8.carry_full(jnp.asarray(x))
        assert val(got) == v % (1 << 256), trial
        assert float(np.asarray(got).max()) <= 255, trial


def test_expand16_to8_roundtrip():
    rng = np.random.default_rng(2)
    from halo2_verifier_tpu.ops.limbs import ints_to_limbs

    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            * int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))
            % P for _ in range(32)]
    u = jnp.asarray(ints_to_limbs(vals)).T
    assert from_arr(l8.expand16_to8(u)) == vals


@pytest.mark.skipif(
    not os.environ.get("H2V_RUN_F8_E2E"),
    reason="f8 MSM graph compiles slowly on XLA-CPU; covered on TPU "
           "(bench) — set H2V_RUN_F8_E2E=1 to run here",
)
def test_f8_msm_small():
    os.environ["H2V_LIMB_BACKEND"] = "f8"
    try:
        from halo2_verifier_tpu.ops import hostcurve as hc
        from halo2_verifier_tpu.ops import msm_jax
        from halo2_verifier_tpu.ops.constants import G1_GEN
        from halo2_verifier_tpu.ops.limbs import ints_to_limbs

        rng = np.random.RandomState(3)
        n = 12
        pts = [hc.g1_mul(G1_GEN, 2 + 5 * i) for i in range(2 * n)]
        scalars = [int(rng.randint(1, 1 << 60)) ** 2 % R
                   for _ in range(2 * n)]
        s_np = ints_to_limbs(scalars)
        x_np = ints_to_limbs([p[0] for p in pts])
        y_np = ints_to_limbs([p[1] for p in pts])
        idx, keys, levels = msm_jax.host_plan(s_np, 2)
        arr = msm_jax.msm_window_totals_grouped(
            x_np, y_np, idx, keys, 2, levels, backend="f8"
        )
        got = msm_jax.combine_window_totals_grouped(arr, 2)
        assert got == [hc.g1_msm(scalars[:n], pts[:n]),
                       hc.g1_msm(scalars[n:], pts[n:])]
    finally:
        os.environ.pop("H2V_LIMB_BACKEND", None)
