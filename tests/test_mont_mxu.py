"""The MXU constant-convolution Montgomery path (ops/lmfield.py
_mxu_conv_const): byte-digit bf16 matmuls against the banded N'/N matrices
must be bit-exact vs the classic 3-convolution VPU body and the host
oracle, for both fields, including non-canonical 2^16 limbs."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy_compile

from halo2_verifier_tpu.ops import lmfield as lf
from halo2_verifier_tpu.ops.constants import P, R
from halo2_verifier_tpu.ops.field_jax import FQ, FR
from halo2_verifier_tpu.ops.limbs import ints_to_limbs, limbs_to_ints


def _vals(mod, n, seed):
    rng = np.random.RandomState(seed)
    vals = [int.from_bytes(rng.bytes(32), "little") % mod for _ in range(n)]
    vals[:4] = [0, 1, mod - 1, (1 << 254) % mod]
    return vals


@pytest.mark.parametrize("spec,mod", [(FQ, P), (FR, R)], ids=["fq", "fr"])
def test_mxu_mont_mul_exact(spec, mod, monkeypatch):
    va, vb = _vals(mod, 64, 3), _vals(mod, 64, 4)
    A = jnp.asarray(np.asarray(ints_to_limbs(va)).T)
    B = jnp.asarray(np.asarray(ints_to_limbs(vb)).T)
    rinv = pow(1 << 256, -1, mod)
    expect = [(a * b * rinv) % mod for a, b in zip(va, vb)]

    monkeypatch.setenv("H2V_MONT_MXU", "1")
    got = limbs_to_ints(np.asarray(lf.mont_mul_body(A, B, spec)).T)
    assert got == expect

    monkeypatch.setenv("H2V_MONT_MXU", "0")
    got_classic = limbs_to_ints(np.asarray(lf.mont_mul_body(A, B, spec)).T)
    assert got_classic == expect


def test_mxu_point_add_matches_classic(monkeypatch):
    """Full RCB15 point adds through the MXU body agree with the classic
    body and the host oracle."""
    from halo2_verifier_tpu.ops import hostcurve as hc
    from halo2_verifier_tpu.ops import lmcurve as lc
    from halo2_verifier_tpu.ops.constants import G1_GEN

    n = 16
    pts_p = [hc.g1_mul(G1_GEN, 3 + i) for i in range(n)]
    pts_q = [hc.g1_mul(G1_GEN, 101 + 7 * i) for i in range(n)]
    mont = lf.FQ.mont_r

    def to_dev(pts):
        x = jnp.asarray(np.asarray(
            ints_to_limbs([p[0] * mont % P for p in pts])).T)
        y = jnp.asarray(np.asarray(
            ints_to_limbs([p[1] * mont % P for p in pts])).T)
        return lc.OPS16.from_affine(x, y)

    def run():
        out = lc.OPS16.add_body(to_dev(pts_p), to_dev(pts_q))
        xs = limbs_to_ints(np.asarray(out[0]).T)
        ys = limbs_to_ints(np.asarray(out[1]).T)
        zs = limbs_to_ints(np.asarray(out[2]).T)
        rinv = pow(1 << 256, -1, P)
        res = []
        for x, y, z in zip(xs, ys, zs):
            x, y, z = (x * rinv) % P, (y * rinv) % P, (z * rinv) % P
            zi = pow(z, -1, P)
            res.append((x * zi % P, y * zi % P))
        return res

    monkeypatch.setenv("H2V_MONT_MXU", "1")
    got_mxu = run()
    monkeypatch.setenv("H2V_MONT_MXU", "0")
    got_classic = run()
    expect = [hc.g1_add(p, q) for p, q in zip(pts_p, pts_q)]
    assert got_mxu == expect
    assert got_classic == expect


def test_byte_digit_roundtrip():
    """_byte_digits handles the non-canonical 65536 limb (hi digit 256,
    still bf16-exact)."""
    x = jnp.asarray(
        np.full((lf.NLIMBS, 4), 65536, dtype=np.uint32))
    d = np.asarray(lf._byte_digits(x))
    assert d.shape == (2 * lf.NLIMBS, 4)
    assert (d[0::2] == 0).all() and (d[1::2] == 256).all()
    assert float(jnp.asarray(256, jnp.bfloat16)) == 256.0
