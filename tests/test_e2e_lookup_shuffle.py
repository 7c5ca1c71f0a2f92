"""E2E coverage for the lookup and shuffle argument paths (the reference's
own test suite never exercises lookup::Argument — SURVEY.md §4), plus the
two-phase/in-circuit-challenge machinery of tests/shuffle.rs."""

import pytest

from halo2_verifier_tpu.prover.circuits import lookup_spec, shuffle_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.verifier import verify_proof_single
from halo2_verifier_tpu.transcript import TRANSCRIPT_WRITERS


@pytest.fixture(scope="module")
def srs8():
    return load_srs(8)


def _prove(pk, asg, **kw):
    return create_proof(pk, [asg], TRANSCRIPT_WRITERS["blake2b"](), **kw)


def test_lookup_verifies(srs8):
    table = [1, 3, 5, 7, 9, 11, 13, 15]
    spec, make_assignment, a_col = lookup_spec(8, table, lookups_rows=16)
    pk = keygen(spec, srs8)
    params = srs8.verifier_params()
    asg = make_assignment([table[i % len(table)] for i in range(16)])
    proof = _prove(pk, asg)
    assert verify_proof_single(params, pk.vk, proof, [[]])


def test_lookup_bad_witness_rejected(srs8):
    table = [1, 3, 5, 7]
    spec, make_assignment, a_col = lookup_spec(8, table, lookups_rows=8)
    pk = keygen(spec, srs8)
    # witness value 4 is not in the table: the prover itself must refuse
    asg = make_assignment([1, 3, 4, 7, 1, 1, 1, 1])
    with pytest.raises(AssertionError):
        _prove(pk, asg)


def test_shuffle_two_phases_verifies(srs8):
    W, H = 4, 32
    spec, make_assignment = shuffle_spec(8, W, H)
    pk = keygen(spec, srs8)
    params = srs8.verifier_params()
    cols = [[(c * 1000 + i * 7 + 1) for i in range(H)] for c in range(W)]
    perm = list(range(H))
    perm = perm[5:] + perm[:5]  # rotate rows
    asg = make_assignment(cols, perm)
    proof = _prove(pk, asg)
    assert verify_proof_single(params, pk.vk, proof, [[]])
    assert pk.vk.cs.num_challenges == 1
    assert max(pk.vk.cs.advice_column_phase) == 1


def test_shuffle_not_a_permutation_rejected(srs8):
    W, H = 2, 8
    spec, make_assignment = shuffle_spec(8, W, H)
    pk = keygen(spec, srs8)
    cols = [[i + 1 for i in range(H)] for _ in range(W)]
    bad_perm = [0] * H  # not a permutation: products do not telescope
    asg = make_assignment(cols, bad_perm)
    with pytest.raises(AssertionError):
        _prove(pk, asg)
