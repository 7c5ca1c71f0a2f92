"""Public-API parity with the reference's surface (SURVEY.md §2) and
determinism guarantees (SURVEY.md §5: integer kernels must be exactly
reproducible — same batch twice => identical accumulator bits)."""

import pytest

import numpy as np

pytestmark = pytest.mark.usefixtures("host_msm_mode")


def test_public_api_surface():
    import halo2_verifier_tpu as h

    for name in h.__all__:
        assert getattr(h, name) is not None, name
    # arithmetic utility layer (arithmetic.rs API)
    from halo2_verifier_tpu.ops import arith

    assert arith.eval_polynomial([1, 2, 3], 10) == 321
    assert arith.compute_inner_product([1, 2], [3, 4]) == 11
    gen = arith.powers(5)
    assert [next(gen) for _ in range(4)] == [1, 5, 25, 125]
    assert arith.evaluate_vanishing_polynomial([1, 2], 4) == 6
    poly = arith.lagrange_interpolate([1, 2, 3], [1, 4, 9])
    assert [arith.eval_polynomial(poly, x) for x in (1, 2, 3)] == [1, 4, 9]

    r = h.Rotation.prev()
    assert int(r) == -1
    g = None
    from halo2_verifier_tpu.protocol.kzg import Blind

    assert (Blind(3) * Blind(4)).value == 12


def test_batch_determinism():
    """Same batch, same weights => bit-identical DualMSM accumulators and
    window totals, across repeated runs (integer kernels, no floats on the
    default path)."""
    from halo2_verifier_tpu.prover.circuits import vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs
    from halo2_verifier_tpu.transcript import Blake2bWrite
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 4)
    pk = keygen(spec, srs)
    params = srs.verifier_params()
    batch = []
    for i in range(3):
        asg = make_assignment([i + 2] * 4, [i + 5] * 4)
        batch.append((create_proof(pk, [asg], Blake2bWrite(),
                                   seed=str(i).encode()), asg.instance))

    def run():
        rng_vals = iter([7, 11, 13])
        bv = BatchVerifier(params, pk.vk, rng=lambda: next(rng_vals))
        duals = bv.replay(batch)
        weights = [7, 11, 13]
        left, right = bv._eval_combined(duals, weights)
        return left, right

    a = run()
    b = run()
    assert a == b
