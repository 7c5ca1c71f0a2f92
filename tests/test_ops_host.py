"""Unit tests for the exact host arithmetic layer — the correctness oracles
every device kernel is later tested against (SURVEY.md §4 test pyramid)."""

import os

import pytest

from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops import hostfield as hf
from halo2_verifier_tpu.ops import hostpairing as hp
from halo2_verifier_tpu.ops.constants import (
    FR_DELTA,
    FR_GENERATOR,
    FR_ROOT_OF_UNITY,
    FR_S,
    G1_GEN,
    G2_GEN,
    P,
    R,
)

REF_SRS = "/root/reference/halo2_verifier/params/kzg_bn254_8.srs"


def test_field_constants():
    assert pow(FR_ROOT_OF_UNITY, 1 << FR_S, R) == 1
    assert pow(FR_ROOT_OF_UNITY, 1 << (FR_S - 1), R) == R - 1
    assert FR_DELTA == pow(FR_GENERATOR, 1 << FR_S, R)


def test_batch_invert():
    vals = [1, 2, 12345, 0, R - 1, 987654321 % R]
    out = hf.batch_invert(vals, R)
    for v, o in zip(vals, out):
        if v == 0:
            assert o == 0
        else:
            assert v * o % R == 1


def test_fr_uniform_and_repr():
    b = bytes(range(64))
    v = hf.fr_from_uniform_bytes(b)
    assert v == int.from_bytes(b, "little") % R
    assert hf.from_repr(hf.to_repr(v), R) == v
    with pytest.raises(ValueError):
        hf.from_repr(R.to_bytes(32, "little"), R)


def test_montgomery_raw_roundtrip():
    for v in [0, 1, 12345, P - 1]:
        assert hf.fq_from_raw(hf.fq_to_raw(v)) == v
    for v in [0, 1, 98765, R - 1]:
        assert hf.fr_from_raw(hf.fr_to_raw(v)) == v


def test_fq2_arithmetic():
    a, b = (3, 5), (7, 11)
    assert hf.fq2_mul(a, hf.fq2_inv(a)) == hf.FQ2_ONE
    assert hf.fq2_mul(a, b) == hf.fq2_mul(b, a)
    sq = hf.fq2_square(a)
    assert sq == hf.fq2_mul(a, a)
    root = hf.fq2_sqrt(sq)
    assert root in (a, hf.fq2_neg(a))


def test_g1_codec_roundtrip():
    pts = [None, G1_GEN, hc.g1_mul(G1_GEN, 7), hc.g1_mul(G1_GEN, 123456789)]
    for pt in pts:
        assert hc.g1_from_bytes(hc.g1_to_bytes(pt)) == pt
        assert hc.g1_from_raw(hc.g1_to_raw(pt)) == pt


def test_g2_codec_roundtrip():
    pts = [None, G2_GEN, hc.g2_mul(G2_GEN, 99)]
    for pt in pts:
        assert hc.g2_from_bytes(hc.g2_to_bytes(pt)) == pt
        assert hc.g2_from_raw(hc.g2_to_raw(pt)) == pt


def test_invalid_point_rejected():
    # find an x with x^3 + 3 a non-residue, then feed its encoding
    x = 2
    while hf.fq_sqrt((x * x * x + 3) % P) is not None:
        x += 1
    with pytest.raises(ValueError):
        hc.g1_from_bytes(hf.to_repr(x))
    # non-canonical field repr must also be rejected
    with pytest.raises(ValueError):
        hc.g1_from_bytes((P + 1).to_bytes(32, "little"))
    # identity encodes as all-zero and decodes to None
    assert hc.g1_from_bytes(bytes(32)) is None


def test_group_laws():
    a = hc.g1_mul(G1_GEN, 1234)
    b = hc.g1_mul(G1_GEN, 5678)
    assert hc.g1_add(a, b) == hc.g1_mul(G1_GEN, 1234 + 5678)
    assert hc.g1_add(a, hc.g1_neg(a)) is None
    assert hc.g1_mul(G1_GEN, R) is None
    assert hc.g2_mul(G2_GEN, R) is None


def test_msm_matches_naive():
    import random

    rng = random.Random(7)
    pts = [hc.g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(20)]
    scalars = [rng.randrange(R) for _ in range(20)]
    expected = None
    for s, p in zip(scalars, pts):
        expected = hc.g1_add(expected, hc.g1_mul(p, s))
    assert hc.g1_msm(scalars, pts) == expected
    # degenerate inputs
    assert hc.g1_msm([], []) is None
    assert hc.g1_msm([0, R], [pts[0], pts[1]]) is None


def test_jacobian_matches_affine():
    a = hc.g1_mul(G1_GEN, 111)
    b = hc.g1_mul(G1_GEN, 222)
    assert hc.j_to_affine(hc.j_add(hc.j_from_affine(a), hc.j_from_affine(b))) \
        == hc.g1_add(a, b)
    assert hc.j_to_affine(hc.j_double(hc.j_from_affine(a))) == hc.g1_double(a)
    assert hc.j_to_affine(hc.j_add_affine(hc.j_from_affine(a), b)) == hc.g1_add(a, b)


def test_pairing_bilinearity():
    e = hp.pairing(G1_GEN, G2_GEN)
    assert e != hp.FQ12_ONE
    a, b = 654321, 123456
    assert hp.pairing(hc.g1_mul(G1_GEN, a), hc.g2_mul(G2_GEN, b)) == \
        hp.fq12_pow(e, a * b % R)
    assert hp.pairing_check([
        (hc.g1_mul(G1_GEN, a), G2_GEN),
        (hc.g1_neg(hc.g1_mul(G1_GEN, a)), G2_GEN),
    ])
    assert hp.pairing(None, G2_GEN) == hp.FQ12_ONE


@pytest.mark.skipif(not os.path.exists(REF_SRS),
                    reason="reference SRS fixture unavailable")
def test_reference_srs_fixture():
    """Cross-implementation: parse the reference-produced binary SRS and
    check its internal pairing consistency."""
    from halo2_verifier_tpu.prover.srs import FullSRS

    with open(REF_SRS, "rb") as f:
        srs = FullSRS.from_bytes(f.read())
    assert srs.k == 8
    assert srs.g[0] == G1_GEN
    assert srs.g2 == G2_GEN
    # e(s*G1, G2) == e(G1, s*G2)
    assert hp.pairing_check([
        (srs.g[1], srs.g2), (hc.g1_neg(srs.g[0]), srs.s_g2)
    ])
    # roundtrip the fat codec
    assert FullSRS.from_bytes(srs.to_bytes()).g[:4] == srs.g[:4]
    # verifier params: 164-byte Processed encoding
    # (poly/kzg/commitment.rs:209-213)
    params = srs.verifier_params()
    assert len(params.to_bytes("processed")) == 164
    from halo2_verifier_tpu.protocol.kzg import ParamsKZG

    rt = ParamsKZG.from_bytes(params.to_bytes("processed"), "processed")
    assert (rt.g, rt.g2, rt.s_g2, rt.k) == (params.g, params.g2,
                                            params.s_g2, params.k)
    rt2 = ParamsKZG.from_bytes(params.to_bytes("raw_bytes"), "raw_bytes")
    assert rt2.g == params.g
