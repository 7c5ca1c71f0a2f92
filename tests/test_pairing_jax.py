"""Device (jitted) BN254 pairing vs the exact host oracle
(ops/hostpairing.py, itself differential-tested against
native/pairing.cpp in test_native.py). Covers the last host-only compute
stage's device equivalent (reference pairing site: kzg/msm.rs:185-203)."""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy_compile

from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops import hostpairing as hp
from halo2_verifier_tpu.ops import pairing_jax as pj
from halo2_verifier_tpu.ops.constants import G1_GEN, G2_GEN, R


def _g1(k):
    return hc.g1_mul(G1_GEN, k % R)


def _g2(k):
    return hc.g2_mul(G2_GEN, k % R)


def test_miller_loop_matches_oracle_lanes():
    """Per-lane Miller loop outputs are bit-identical to the oracle for
    several (P, Q) pairs evaluated in parallel lanes."""
    import jax.numpy as jnp

    pairs = [(_g1(3), _g2(5)), (_g1(7), _g2(11)), (_g1(1), _g2(1))]
    g1 = np.stack([
        pj._mont_cols([p[0] for p, _ in pairs]),
        pj._mont_cols([p[1] for p, _ in pairs]),
    ])
    g2 = np.stack([
        pj._mont_cols([q[0][0] for _, q in pairs]),
        pj._mont_cols([q[0][1] for _, q in pairs]),
        pj._mont_cols([q[1][0] for _, q in pairs]),
        pj._mont_cols([q[1][1] for _, q in pairs]),
    ])
    out = np.asarray(pj._miller_lanes_fn(jnp.asarray(g1), jnp.asarray(g2)))
    for i, (p, q) in enumerate(pairs):
        assert pj.fq12_from_device(out, lane=i) == hp.miller_loop(p, q), (
            f"lane {i} Miller output != oracle"
        )


def test_pairing_check_bilinearity():
    """e(aG1, bG2) * e(-abG1, G2) == 1 — the DualMSM::check shape
    (kzg/msm.rs:185-203) — accepted on device; a tampered pair rejected."""
    a, b = 6, 13
    good = [
        (_g1(a), _g2(b)),
        (hc.g1_neg(_g1(a * b)), G2_GEN),
    ]
    assert pj.pairing_check_device(good) is True
    assert hp.pairing_check(good) is True  # oracle agrees

    bad = [
        (_g1(a), _g2(b)),
        (hc.g1_neg(_g1(a * b + 1)), G2_GEN),
    ]
    assert pj.pairing_check_device(bad) is False
    assert hp.pairing_check(bad) is False


def test_pairing_check_identity_pairs():
    """Identity G1/G2 members contribute 1 (engine skip semantics)."""
    assert pj.pairing_check_device([(None, G2_GEN)]) is True
    assert pj.pairing_check_device([(G1_GEN, None), (None, None)]) is True
    a, b = 4, 9
    mixed = [
        (None, _g2(3)),
        (_g1(a), _g2(b)),
        (hc.g1_neg(_g1(a * b)), G2_GEN),
    ]
    assert pj.pairing_check_device(mixed) is True
