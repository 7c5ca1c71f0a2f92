"""Verifier-side rejection of forged proofs (VERDICT round-2 item 3).

The reference's negative shuffle test tampers the *witness* and the
*verifier* rejects the emitted proof (tests/shuffle.rs:287-308). These tests
use create_proof(..., unchecked=True) to emit well-formed but invalid
proofs — structurally parseable, wrong algebra — and assert rejection
happens at the verifier (pairing failure), not the prover, for each
argument kind: lookup, shuffle, and permutation (copy constraints).
Batch localization must finger the forged proof.
"""

import pytest

from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier
from halo2_verifier_tpu.prover.circuits import (
    lookup_spec,
    shuffle_spec,
    vector_mul_spec,
)
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.verifier import verify_proof_single
from halo2_verifier_tpu.transcript import Blake2bWrite

pytestmark = pytest.mark.usefixtures("host_msm_mode")


@pytest.fixture(scope="module")
def srs8():
    return load_srs(8)


def _prove(pk, asg, **kw):
    return create_proof(pk, [asg], Blake2bWrite(), **kw)


def test_forged_lookup_rejected_by_verifier(srs8):
    table = [1, 3, 5, 7]
    spec, make_assignment, _ = lookup_spec(8, table, lookups_rows=8)
    pk = keygen(spec, srs8)
    params = srs8.verifier_params()
    # witness value 4 is not in the table: the unchecked prover emits the
    # invalid proof anyway; rejection must come from the verifier
    bad = make_assignment([1, 3, 4, 7, 1, 1, 1, 1])
    proof = _prove(pk, bad, unchecked=True)
    assert len(proof) > 0
    assert not verify_proof_single(params, pk.vk, proof, [[]])
    # sanity: the same pipeline accepts an honest witness
    good = make_assignment([1, 3, 5, 7, 1, 1, 1, 1])
    assert verify_proof_single(params, pk.vk, _prove(pk, good), [[]])


def test_forged_shuffle_rejected_by_verifier(srs8):
    W, H = 2, 8
    spec, make_assignment = shuffle_spec(8, W, H)
    pk = keygen(spec, srs8)
    params = srs8.verifier_params()
    cols = [[i + 1 for i in range(H)] for _ in range(W)]
    bad_perm = [0] * H  # not a permutation (tests/shuffle.rs:287-308 analog)
    proof = _prove(pk, make_assignment(cols, bad_perm), unchecked=True)
    assert not verify_proof_single(params, pk.vk, proof, [[]])
    good_perm = list(range(H))[3:] + list(range(H))[:3]
    assert verify_proof_single(
        params, pk.vk, _prove(pk, make_assignment(cols, good_perm)), [[]]
    )


def _vector_mul_forged_copy(srs8):
    """A vector_mul witness whose copy constraint (region A cell == mul
    region cell, wired through the permutation argument) is broken while
    every gate still holds."""
    spec, make_assignment = vector_mul_spec(8, 4)
    pk = keygen(spec, srs8)
    a_vals = [2, 3, 4, 5]
    b_vals = [7, 8, 9, 10]
    asg = make_assignment(a_vals, b_vals)
    # adv0 row 0 is region A's a[0], copied to adv0 row 2*n_muls (mul
    # region) — changing only the region-A cell breaks copy constraints
    # without touching the mul gate rows
    asg.advice[0][0] = 999
    return pk, asg, make_assignment(a_vals, b_vals)


def test_forged_copy_constraint_rejected_by_verifier(srs8):
    pk, bad_asg, good_asg = _vector_mul_forged_copy(srs8)
    params = srs8.verifier_params()
    proof = _prove(pk, bad_asg, unchecked=True)
    assert not verify_proof_single(params, pk.vk, proof, [bad_asg.instance])
    assert verify_proof_single(
        params, pk.vk, _prove(pk, good_asg), [good_asg.instance]
    )


def test_batch_localization_fingers_forged_proof(srs8):
    pk, bad_asg, good_asg = _vector_mul_forged_copy(srs8)
    params = srs8.verifier_params()
    bad = (_prove(pk, bad_asg, unchecked=True), bad_asg.instance)
    goods = [
        (_prove(pk, good_asg, seed=str(i).encode()), good_asg.instance)
        for i in range(2)
    ]
    bv = BatchVerifier(params, pk.vk)
    result = bv.verify([goods[0], bad, goods[1]])
    assert not result.ok
    assert result.failed_indices == [1]
