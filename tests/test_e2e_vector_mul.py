"""End-to-end differential test on the vector-mul circuit — the analogue of
the reference's tests/vector_mul.rs:297-333: prove with the test prover,
verify with the framework verifier, and assert the tampered-instance proof
fails."""

import pytest

from halo2_verifier_tpu.prover.circuits import vector_mul_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.verifier import verify_proof_single
from halo2_verifier_tpu.transcript import TRANSCRIPT_WRITERS


@pytest.fixture(scope="module")
def vm_setup():
    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 10)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    return srs, pk, params, make_assignment


def _prove(pk, asg, multiopen="shplonk", hash_name="blake2b"):
    transcript = TRANSCRIPT_WRITERS[hash_name]()
    return create_proof(pk, [asg], transcript, multiopen=multiopen)


@pytest.mark.parametrize("multiopen", ["shplonk", "gwc"])
def test_vector_mul_verifies(vm_setup, multiopen):
    srs, pk, params, make_assignment = vm_setup
    a = [2] * 10
    b = [3] * 10
    asg = make_assignment(a, b)
    proof = _prove(pk, asg, multiopen=multiopen)
    assert verify_proof_single(params, pk.vk, proof, [asg.instance],
                               multiopen=multiopen)


@pytest.mark.parametrize("multiopen", ["shplonk", "gwc"])
def test_vector_mul_tampered_instance_fails(vm_setup, multiopen):
    srs, pk, params, make_assignment = vm_setup
    asg = make_assignment([2] * 10, [3] * 10)
    proof = _prove(pk, asg, multiopen=multiopen)
    bad_instance = [list(asg.instance[0])]
    bad_instance[0][0] = (bad_instance[0][0] + 1) % (2**64)
    assert not verify_proof_single(params, pk.vk, proof, [bad_instance],
                                   multiopen=multiopen)


def test_vector_mul_keccak_transcript(vm_setup):
    srs, pk, params, make_assignment = vm_setup
    asg = make_assignment([5] * 4, [7] * 4)
    proof = _prove(pk, asg, hash_name="keccak256")
    assert verify_proof_single(params, pk.vk, proof, [asg.instance],
                               hash_name="keccak256")
    # wrong hash on the verifier side must fail
    assert not verify_proof_single(params, pk.vk, proof, [asg.instance],
                                   hash_name="blake2b")


def test_corrupted_proof_fails(vm_setup):
    srs, pk, params, make_assignment = vm_setup
    asg = make_assignment([2] * 10, [3] * 10)
    proof = bytearray(_prove(pk, asg))
    proof[40] ^= 1
    assert not verify_proof_single(params, pk.vk, bytes(proof),
                                   [asg.instance])


def test_vk_roundtrip(vm_setup):
    from halo2_verifier_tpu.protocol.vk import VerifyingKey

    srs, pk, params, make_assignment = vm_setup
    for fmt in ("processed", "raw_bytes", "raw_bytes_unchecked"):
        data = pk.vk.to_bytes(fmt)
        vk2 = VerifyingKey.from_bytes(data, fmt)
        assert vk2.to_bytes(fmt) == data
        assert vk2.transcript_repr == pk.vk.transcript_repr
        assert vk2.fixed_commitments == pk.vk.fixed_commitments
        assert vk2.cs.coeff_vals == pk.vk.cs.coeff_vals

    # a re-serialized vk must verify proofs identically
    vk2 = VerifyingKey.from_bytes(pk.vk.to_bytes("processed"), "processed")
    asg = make_assignment([2] * 3, [9] * 3)
    proof = _prove(pk, asg)
    assert verify_proof_single(params, vk2, proof, [asg.instance])
