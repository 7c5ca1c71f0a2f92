"""Native (C++) runtime components vs their pure-Python oracles."""

import random

import pytest

from halo2_verifier_tpu import native
from halo2_verifier_tpu.transcript.keccak import _PyKeccak256


def test_keccak_python_kats():
    """Legacy Keccak-256 (0x01 padding) known-answer tests."""
    assert _PyKeccak256().digest().hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert _PyKeccak256().update(b"abc").digest().hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_native_keccak_differential():
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    from halo2_verifier_tpu.transcript.keccak import _NativeKeccak256

    rng = random.Random(7)
    for trial in range(100):
        chunks = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
            for _ in range(rng.randrange(1, 6))
        ]
        a, b = _PyKeccak256(), _NativeKeccak256()
        for c in chunks:
            a.update(c)
            b.update(c)
            if rng.random() < 0.3:
                # squeeze mid-stream: copy() must snapshot sponge + buffer
                assert a.copy().digest() == b.copy().digest(), trial
        assert a.digest() == b.digest(), trial


def test_native_pairing_differential():
    """native/pairing.cpp must reproduce the Python tower bit-for-bit:
    full Fq12 output of the multi-Miller-loop + final exponentiation, the
    e(aP, bQ) == e(abP, Q) bilinearity acceptance, and rejection of a
    perturbed pair. Identities must behave like halo2curves' skip."""
    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    import ctypes

    from halo2_verifier_tpu.ops import hostcurve as hc
    from halo2_verifier_tpu.ops import hostpairing as hp
    from halo2_verifier_tpu.ops.constants import G1_GEN, G2_GEN, R

    rng = random.Random(11)

    def native_full(pairs):
        g1, g2 = hp._encode_pairs(pairs)
        out = ctypes.create_string_buffer(12 * 32)
        ok = lib.h2v_pairing_check(g1, g2, len(pairs), out)
        coeffs = [
            int.from_bytes(out.raw[i * 32:(i + 1) * 32], "little")
            for i in range(12)
        ]
        f = (
            ((coeffs[0], coeffs[1]), (coeffs[2], coeffs[3]),
             (coeffs[4], coeffs[5])),
            ((coeffs[6], coeffs[7]), (coeffs[8], coeffs[9]),
             (coeffs[10], coeffs[11])),
        )
        return bool(ok), f

    for trial in range(3):
        a = rng.randrange(1, R)
        b = rng.randrange(1, R)
        pa = hc.g1_mul(G1_GEN, a)
        qb = hc.g2_mul(G2_GEN, b)
        pab = hc.g1_mul(G1_GEN, a * b % R)
        # e(aP, bQ) * e(-abP, Q) == 1
        pairs = [(pa, qb), (hc.g1_neg(pab), G2_GEN)]
        ok, f = native_full(pairs)
        expected = hp.final_exponentiation(hp.multi_miller_loop(pairs))
        assert f == expected, trial
        assert ok and expected == hp.FQ12_ONE, trial
        # perturbed: must reject, still bit-identical to the oracle
        bad = [(pa, qb), (hc.g1_neg(hc.g1_mul(G1_GEN, a * b % R + 1)),
                          G2_GEN)]
        ok_bad, f_bad = native_full(bad)
        exp_bad = hp.final_exponentiation(hp.multi_miller_loop(bad))
        assert f_bad == exp_bad and not ok_bad, trial

    # identity skipping
    ok, f = native_full([(None, G2_GEN), (G1_GEN, None)])
    assert ok and f == hp.FQ12_ONE
