"""Error-surface parity with the reference's Error enum (plonk/mod.rs:19-32):
InstanceTooLarge and BoundsFailure must be raised, not just defined, and
VerifierConfig.strategy must actually select Single vs Accumulator
semantics (kzg/strategy.rs:125-141,164-177)."""

import pytest

from halo2_verifier_tpu.config import VerifierConfig
from halo2_verifier_tpu.protocol.columns import ADVICE, Column
from halo2_verifier_tpu.prover.circuits import vector_mul_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.kzg import BoundsFailure, InstanceTooLarge
from halo2_verifier_tpu.protocol.verifier import verify_proof
from halo2_verifier_tpu.protocol.vk import VerifyingKey
from halo2_verifier_tpu.transcript import TRANSCRIPT_READERS, TRANSCRIPT_WRITERS

pytestmark = pytest.mark.usefixtures("host_msm_mode")


@pytest.fixture(scope="module")
def setup():
    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 10)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    asg = make_assignment([2] * 10, [3] * 10)
    transcript = TRANSCRIPT_WRITERS["blake2b"]()
    proof = create_proof(pk, [asg], transcript)
    return params, pk, proof, asg


def test_instance_too_large_raised(setup):
    """Instance rows past n - (blinding_factors + 1) must raise
    Error::InstanceTooLarge (plonk/mod.rs:30-31), not silently hash into
    the transcript."""
    params, pk, proof, asg = setup
    usable = params.n - (pk.vk.cs.blinding_factors() + 1)
    oversized = [[1] * (usable + 1)]

    class _Strategy:
        def process(self, f):
            raise AssertionError("must fail before strategy runs")

    t = TRANSCRIPT_READERS["blake2b"](proof)
    with pytest.raises(InstanceTooLarge):
        verify_proof(params, pk.vk, _Strategy(), [oversized], t)


def test_bounds_failure_on_corrupt_vk_query_index(setup):
    """A vk whose advice query points at a nonexistent column must raise
    Error::BoundsFailure at deserialization (plonk/mod.rs:25,46)."""
    params, pk, proof, asg = setup
    vk = pk.vk
    good = vk.to_bytes()
    # corrupt in-memory instead of byte surgery: re-read the good bytes,
    # then push one advice query column index out of range and re-serialize
    tampered = VerifyingKey.from_bytes(good)
    col, rot = tampered.cs.advice_queries[0]
    tampered.cs.advice_queries[0] = (
        Column(ADVICE, tampered.cs.num_advice_columns + 7, col.phase), rot
    )
    bad = tampered.to_bytes()
    with pytest.raises(BoundsFailure):
        VerifyingKey.from_bytes(bad)


def test_bounds_failure_on_corrupt_gate_variable(setup):
    params, pk, proof, asg = setup
    tampered = VerifyingKey.from_bytes(pk.vk.to_bytes())
    cs = tampered.cs
    num_vars = (len(cs.advice_queries) + len(cs.fixed_queries)
                + len(cs.instance_queries) + cs.num_challenges)
    gate = cs.gates[0]
    coeff_idx, term = gate.terms[0]
    gate.terms[0] = (coeff_idx, ((num_vars + 3, 1),))
    with pytest.raises(BoundsFailure):
        VerifyingKey.from_bytes(tampered.to_bytes())


def test_good_vk_roundtrips_clean(setup):
    params, pk, proof, asg = setup
    vk2 = VerifyingKey.from_bytes(pk.vk.to_bytes())
    assert vk2.to_bytes() == pk.vk.to_bytes()


def test_config_strategy_single_is_live(setup):
    """strategy='single' must select SingleStrategy semantics: immediate
    per-proof verification with exact failure identification."""
    params, pk, proof, asg = setup
    cfg = VerifierConfig(strategy="single")
    bv = cfg.make_verifier(params, pk.vk)
    assert bv.strategy == "single"
    good = (proof, asg.instance)
    bad_instance = [list(asg.instance[0])]
    bad_instance[0][0] += 1
    bad = (proof, bad_instance)
    res = bv.verify([good, bad, good])
    assert not res.ok
    assert res.failed_indices == [1]
    # stream mode degenerates to per-batch individual verification
    results = list(bv.verify_stream(iter([[good], [bad]])))
    assert results[0].ok and not results[1].ok


def test_config_strategy_accumulator_default(setup):
    params, pk, proof, asg = setup
    bv = VerifierConfig().make_verifier(params, pk.vk)
    assert bv.strategy == "accumulator"
    assert bv.verify([(proof, asg.instance)]).ok


def test_unknown_strategy_rejected(setup):
    params, pk, proof, asg = setup
    with pytest.raises(ValueError):
        VerifierConfig(strategy="bogus").make_verifier(params, pk.vk)
