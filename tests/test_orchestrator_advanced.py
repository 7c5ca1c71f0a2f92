"""Pipelined streaming, heterogeneous-vk batches, and determinism —
TPU-native orchestration features with no reference counterpart
(SURVEY.md §2.3: PP / EP-analog rows; §5 determinism checks)."""

import pytest

from halo2_verifier_tpu.ops.constants import R


@pytest.fixture(scope="module")
def two_circuits():
    from halo2_verifier_tpu.prover.circuits import lookup_spec, vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs
    from halo2_verifier_tpu.transcript import Blake2bWrite

    srs = load_srs(8)
    vm_spec, vm_mk = vector_mul_spec(8, 3)
    vm_pk = keygen(vm_spec, srs)
    # gating covers rows [0, lookups_rows): keep the whole table gated
    lk_spec, lk_mk, _ = lookup_spec(8, [1, 3, 5, 7], 8)
    lk_pk = keygen(lk_spec, srs)

    vm_proofs = []
    for i in range(2):
        a = vm_mk([i + 2] * 3, [i + 5] * 3)
        vm_proofs.append(
            (create_proof(vm_pk, [a], Blake2bWrite(), seed=bytes([i])),
             a.instance, vm_pk.vk)
        )
    lk_proofs = []
    for i in range(2):
        a = lk_mk([1, 3, 5, 7, [1, 3][i], 5, 7, 1])
        lk_proofs.append(
            (create_proof(lk_pk, [a], Blake2bWrite(), seed=bytes([16 + i])),
             a.instance, lk_pk.vk)
        )
    return srs.verifier_params(), vm_proofs, lk_proofs


def test_heterogeneous_vk_batch(two_circuits):
    """Proofs of DIFFERENT circuits verified in one batch: shared device
    MSMs + one pairing (BASELINE config 4)."""
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vm_proofs, lk_proofs = two_circuits
    items = [vm_proofs[0], lk_proofs[0], vm_proofs[1], lk_proofs[1]]
    bv = BatchVerifier(params, vk=None)
    res = bv.verify(items, localize=False)
    assert res.ok and res.num_proofs == 4


def test_heterogeneous_localizes_bad_proof(two_circuits):
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vm_proofs, lk_proofs = two_circuits
    bad_instance = [[(v + 1) % R for v in vm_proofs[1][1][0]]]
    items = [
        vm_proofs[0],
        lk_proofs[0],
        (vm_proofs[1][0], bad_instance, vm_proofs[1][2]),
        lk_proofs[1],
    ]
    bv = BatchVerifier(params, vk=None)
    res = bv.verify(items)
    assert not res.ok
    assert res.failed_indices == [2]


def test_verify_stream_pipelined(two_circuits):
    """Streamed batches: device MSMs of batch k overlap host replay of
    batch k+1; results arrive in order."""
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vm_proofs, lk_proofs = two_circuits
    batches = [
        [vm_proofs[0], lk_proofs[0]],
        [vm_proofs[1], lk_proofs[1]],
        [vm_proofs[0], lk_proofs[1]],
    ]
    bv = BatchVerifier(params, vk=None)
    results = list(bv.verify_stream(batches, pad_to=128))
    assert [r.ok for r in results] == [True, True, True]
    assert bv.timings.counts.get("device_msm_dispatch", 0) == 3


def test_batch_accumulator_determinism(two_circuits):
    """Same batch + same weights => bit-identical accumulator points
    (integer kernels must be exactly reproducible; SURVEY.md §5)."""
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vm_proofs, lk_proofs = two_circuits
    items = [vm_proofs[0], lk_proofs[0]]
    seq = iter(range(3, 100))
    bv = BatchVerifier(params, vk=None, rng=lambda: next(seq))
    duals = bv.replay(items)
    a = bv._eval_combined(duals, [7, 11], pad_to=128)
    b = bv._eval_combined(duals, [7, 11], pad_to=128)
    assert a == b
    c = bv._eval_combined(duals, [8, 11], pad_to=128)
    assert a != c  # different weights must move the accumulator


def test_verify_stream_device_decomp(two_circuits, monkeypatch):
    """H2V_DECOMP=device: the sqrt pre-pass (ops/decomp_jax.py) feeds the
    VM external principal roots; results must match the host-decomp path
    including tamper localization."""
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    monkeypatch.setenv("H2V_DECOMP", "device")
    params, vm_proofs, _ = two_circuits
    vk = vm_proofs[0][2]
    good = [(p, inst) for p, inst, _ in vm_proofs]
    bad_instance = [[(v + 1) % R for v in vm_proofs[1][1][0]]]
    batches = [
        good,
        [good[0], (vm_proofs[1][0], bad_instance)],
    ]
    bv = BatchVerifier(params, vk)
    results = list(bv.verify_stream(batches, pad_to=128))
    assert results[0].ok
    assert not results[1].ok and results[1].failed_indices == [1]


def test_verify_stream_device_decomp_malformed_point(two_circuits,
                                                     monkeypatch):
    """A proof whose point bytes encode x >= q must fail identified on
    the device-decomp path (the VM's range check rejects it before the
    y^2 check)."""
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier
    from halo2_verifier_tpu.protocol.replay_native import (
        CompiledReplay,
        vm_available,
    )

    if not vm_available():
        import pytest

        pytest.skip("native VM unavailable")
    monkeypatch.setenv("H2V_DECOMP", "device")
    params, vm_proofs, _ = two_circuits
    vk = vm_proofs[0][2]
    shape = tuple(len(c) for c in vm_proofs[0][1])
    program = CompiledReplay(params, vk, shape)
    bad = bytearray(vm_proofs[0][0])
    off = program.program.point_offsets[0]
    bad[off:off + 32] = b"\xff" * 32  # x >= q, sign bit set
    batches = [[(vm_proofs[1][0], vm_proofs[1][1]),
                (bytes(bad), vm_proofs[0][1])]]
    bv = BatchVerifier(params, vk)
    results = list(bv.verify_stream(batches, pad_to=128))
    assert not results[0].ok and results[0].failed_indices == [1]
