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
