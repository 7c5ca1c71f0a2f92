"""The upstream-ingestion compiler (serialize-crate interop parity):
recursive Expression trees -> flat SparsePolynomialF -> byte-identical
VerifyingKey vs the direct keygen path (serialize/src/lib.rs:12-24,
38-225, 252-312, 366-373)."""

import pytest

from halo2_verifier_tpu.protocol.columns import ADVICE, INSTANCE, Column
from halo2_verifier_tpu.protocol.expression import (
    AdviceQuery,
    Challenge,
    Constant,
    FixedQuery,
    InstanceQuery,
    Selector,
    UpstreamConstraintSystem,
    UpstreamVerifyingKey,
    VirtualSelectorError,
    convert_constraint_system,
    convert_verifier_key,
    expression_transform,
)
from halo2_verifier_tpu.prover.circuits import lookup_spec, vector_mul_spec
from halo2_verifier_tpu.prover.keygen import keygen
from halo2_verifier_tpu.prover.prove import create_proof
from halo2_verifier_tpu.prover.srs import load_srs
from halo2_verifier_tpu.protocol.verifier import verify_proof_single
from halo2_verifier_tpu.transcript import TRANSCRIPT_WRITERS


@pytest.fixture(scope="module")
def srs():
    return load_srs(8)


def _vector_mul_upstream_cs() -> UpstreamConstraintSystem:
    """The vector_mul circuit described the upstream way: recursive
    expressions over (column, rotation) queries — no pre-assigned query
    indices (tests/vector_mul.rs:94-127 configure())."""
    a0, a1, a2 = AdviceQuery(0), AdviceQuery(1), AdviceQuery(2)
    s_mul = FixedQuery(0)
    gate = s_mul * (a0 * a1 - a2)
    return UpstreamConstraintSystem(
        num_fixed_columns=1,
        num_advice_columns=3,
        num_instance_columns=1,
        num_selectors=0,
        num_challenges=0,
        advice_column_phase=[0, 0, 0],
        challenge_phase=[],
        gates=[[gate]],
        # upstream keygen enumerates queries in first-use order; the gate
        # uses advice 0,1,2 then fixed 0; equality-enabled instance col is
        # queried at rot 0
        advice_queries=[(0, 0, 0), (1, 0, 0), (2, 0, 0)],
        fixed_queries=[(0, 0)],
        instance_queries=[(0, 0)],
        permutation_columns=[Column(ADVICE, 0), Column(ADVICE, 1),
                             Column(ADVICE, 2), Column(INSTANCE, 0)],
    )


def test_vector_mul_vk_byte_identical(srs):
    """convert_verifier_key over the recursive description must reproduce
    the direct-keygen vk BYTE-FOR-BYTE (the serialized cs embeds query
    tables, coeff pool order, and indexed gate terms)."""
    spec, _mk = vector_mul_spec(8, 10)
    pk = keygen(spec, srs)

    ucs = _vector_mul_upstream_cs()
    uvk = UpstreamVerifyingKey(
        k=8,
        cs_degree=pk.vk.cs_degree,
        fixed_commitments=pk.vk.fixed_commitments,
        permutation_commitments=pk.vk.permutation.commitments,
        cs=ucs,
        transcript_repr=pk.vk.transcript_repr,
    )
    vk2 = convert_verifier_key(uvk)
    assert vk2.to_bytes() == pk.vk.to_bytes()


def test_converted_vk_verifies_real_proof(srs):
    spec, mk = vector_mul_spec(8, 10)
    pk = keygen(spec, srs)
    asg = mk([2] * 10, [3] * 10)
    proof = create_proof(pk, [asg], TRANSCRIPT_WRITERS["blake2b"]())

    uvk = UpstreamVerifyingKey(
        k=8, cs_degree=pk.vk.cs_degree,
        fixed_commitments=pk.vk.fixed_commitments,
        permutation_commitments=pk.vk.permutation.commitments,
        cs=_vector_mul_upstream_cs(),
        transcript_repr=pk.vk.transcript_repr,
    )
    vk2 = convert_verifier_key(uvk)
    params = srs.verifier_params()
    assert verify_proof_single(params, vk2, proof, [asg.instance])


def test_lookup_circuit_pool_order_matches(srs):
    """Lookup expressions share the coeff pool with gates in traversal
    order; the converted cs must still be byte-identical."""
    spec, _mk, _a = lookup_spec(8, list(range(16)), 8)
    pk = keygen(spec, srs)

    # the spec registers fixed queries in first-use order: the gating
    # column q (index 1) first, then the table t (index 0)
    qa = FixedQuery(1) * AdviceQuery(0)
    qt = FixedQuery(1) * FixedQuery(0)
    ucs = UpstreamConstraintSystem(
        num_fixed_columns=2,
        num_advice_columns=1,
        num_instance_columns=0,
        num_challenges=0,
        advice_column_phase=[0],
        gates=[],
        advice_queries=[(0, 0, 0)],
        fixed_queries=[(1, 0), (0, 0)],
        instance_queries=[],
        permutation_columns=[],
        lookups=[([qa], [qt])],
    )
    cs2 = convert_constraint_system(ucs)
    assert cs2 == pk.vk.cs


def test_virtual_selector_rejected():
    ucs = _vector_mul_upstream_cs()
    with pytest.raises(VirtualSelectorError):
        expression_transform(ucs, Selector(0) * AdviceQuery(0))


def test_nonexistent_query_rejected():
    ucs = _vector_mul_upstream_cs()
    with pytest.raises(KeyError):
        expression_transform(ucs, AdviceQuery(0, rotation=5))
    with pytest.raises(KeyError):
        expression_transform(ucs, FixedQuery(3))
    with pytest.raises(KeyError):
        expression_transform(ucs, InstanceQuery(0, rotation=-1))


def test_transform_algebra():
    """Scaled/Negated/Challenge fold correctly into the flat space:
    variables are advice(0..A) | fixed | instance | challenge."""
    ucs = UpstreamConstraintSystem(
        num_fixed_columns=1, num_advice_columns=1, num_instance_columns=1,
        num_challenges=1, advice_column_phase=[0], challenge_phase=[0],
        advice_queries=[(0, 0, 0)], fixed_queries=[(0, 0)],
        instance_queries=[(0, 0)],
    )
    # 5*a - c*i  (a=var0, fixed=var1, instance=var2, challenge=var3)
    e = AdviceQuery(0) * 5 - Challenge(0) * InstanceQuery(0)
    p = expression_transform(ucs, e)
    assert p.num_vars == 4
    terms = {tuple(t): c for c, t in p.terms}
    from halo2_verifier_tpu.ops.constants import R
    assert terms[((0, 1),)] == 5
    assert terms[((2, 1), (3, 1))] == R - 1
    # constant folding via the ring ops
    p2 = expression_transform(ucs, Constant(7) + Constant(3))
    assert p2.terms == [(10, ())]
