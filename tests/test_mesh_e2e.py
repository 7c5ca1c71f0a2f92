"""End-to-end MULTI-CHIP verification: BatchVerifier(mesh=...) over real
proofs on the 8-device mesh, covering all three sharded dispatch kinds
(orchestrator._dispatch_limbs: sharded_windows / sharded_forest /
sharded_grouped) and their collect paths, asserting identical verdicts AND
identical accumulator points vs the single-chip path.

This is the multi-chip analogue of the reference's e2e discipline
(halo2_verifier/tests/vector_mul.rs:306-330): proofs in, mesh MSM,
pairing verdict out — plus failure localization, which the reference's
SingleStrategy never needed (kzg/strategy.rs:28-30 documents that batch
finalize only says SOME proof failed).
"""

import os

import jax
import pytest

from halo2_verifier_tpu.ops.constants import R

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

KINDS = [
    # (expected dispatch kind, env forcing it). The production default
    # (window sharding) stays in the fast suite; the fallback kinds
    # compile their own kernel sets and are full-suite only
    # (H2V_FULL_SUITE=1, see conftest heavy_compile).
    pytest.param("sharded_windows", {"H2V_MESH_SHARD": "windows"},
                 id="sharded_windows"),
    pytest.param("sharded_forest", {"H2V_MESH_SHARD": "forest"},
                 id="sharded_forest", marks=pytest.mark.heavy_compile),
    pytest.param("sharded_grouped", {"H2V_MSM": "scan"},
                 id="sharded_grouped", marks=pytest.mark.heavy_compile),
]


def _lcg_rng(seed=0x5DEECE66D):
    """Deterministic isolation-weight stream so the mesh and single-chip
    verifiers accumulate the SAME random linear combination."""
    state = {"x": seed}

    def rng():
        state["x"] = (6364136223846793005 * state["x"] + 1442695040888963407
                      ) % (1 << 64)
        return 1 + state["x"] % (R - 1)

    return rng


def _spy_dispatch(bv):
    """Record the dispatch kinds a BatchVerifier actually uses."""
    seen = []
    orig = bv._dispatch_limbs

    def wrapper(*a, **k):
        h = orig(*a, **k)
        seen.append(h[0])
        return h

    bv._dispatch_limbs = wrapper
    return seen


@pytest.mark.parametrize("kind,env", KINDS)
def test_mesh_accumulator_points_match_single_chip(vm_proofs_k8, kind, env,
                                                   monkeypatch):
    """The mesh path must produce bit-identical DualMSM accumulator points
    to the single-chip path for the same isolation weights — covering
    dispatch (orchestrator.py sharded branches) AND collect
    (combine_sharded_*) for every sharded kind."""
    from halo2_verifier_tpu.parallel.mesh import make_mesh
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    for k, v in env.items():
        monkeypatch.setenv(k, v)
    params, vk, proofs = vm_proofs_k8
    g = _lcg_rng()
    weights = [g() for _ in proofs]

    bv_one = BatchVerifier(params, vk)
    duals = bv_one.replay(proofs)
    ref_left, ref_right = bv_one._eval_combined(duals, weights)

    bv_mesh = BatchVerifier(params, vk, mesh=make_mesh(8))
    seen = _spy_dispatch(bv_mesh)
    left, right = bv_mesh._eval_combined(duals, weights)
    assert seen == [kind]
    assert (left, right) == (ref_left, ref_right)


@pytest.mark.parametrize("kind,env", KINDS)
def test_mesh_batch_verify_ok(vm_proofs_k8, kind, env, monkeypatch):
    """Full verify() on the mesh: proofs in, sharded MSM, pairing verdict
    out — for every sharded dispatch kind."""
    from halo2_verifier_tpu.parallel.mesh import make_mesh
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    for k, v in env.items():
        monkeypatch.setenv(k, v)
    params, vk, proofs = vm_proofs_k8
    bv = BatchVerifier(params, vk, mesh=make_mesh(8), rng=_lcg_rng())
    seen = _spy_dispatch(bv)
    res = bv.verify(proofs, localize=False)
    assert res.ok and res.num_proofs == len(proofs)
    assert seen == [kind]


def test_mesh_localizes_bad_proof(vm_proofs_k8, monkeypatch):
    """A tampered instance in a mesh batch must fail AND localize to the
    same index the single-chip path reports (bisection over sharded
    MSMs)."""
    from halo2_verifier_tpu.parallel.mesh import make_mesh
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    monkeypatch.setenv("H2V_MESH_SHARD", "windows")
    params, vk, proofs = vm_proofs_k8
    bad = list(proofs)
    tampered = [[(v + 1) % R for v in bad[1][1][0]]]
    bad[1] = (bad[1][0], tampered)
    bv = BatchVerifier(params, vk, mesh=make_mesh(8), rng=_lcg_rng())
    res = bv.verify(bad)
    assert not res.ok
    assert res.failed_indices == [1]


def test_mesh_verify_stream(vm_proofs_k8, monkeypatch):
    """The production serving mode (verify_stream pipelining) on the mesh:
    two stream batches through the window-sharded path."""
    from halo2_verifier_tpu.parallel.mesh import make_mesh
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    monkeypatch.setenv("H2V_MESH_SHARD", "windows")
    params, vk, proofs = vm_proofs_k8
    bv = BatchVerifier(params, vk, mesh=make_mesh(8), rng=_lcg_rng())
    seen = _spy_dispatch(bv)
    results = list(bv.verify_stream(iter([proofs, proofs]),
                                    localize=False))
    assert [r.ok for r in results] == [True, True]
    assert seen == ["sharded_windows"] * 2


@pytest.mark.heavy_compile
def test_mesh_indivisible_fallthrough_d3(vm_proofs_k8, monkeypatch):
    """A 3-device mesh divides neither NUM_WINDOWS (32, window sharding)
    nor len(sizes)*NUM_WINDOWS (64, point-sharded forest): production
    auto-select must fall through to the presorted-scan sharded_grouped
    kind WITHOUT any env forcing and still verify (VERDICT r04 weak #5 —
    this fall-through previously had no end-to-end pin)."""
    from halo2_verifier_tpu.parallel.mesh import make_mesh
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    for var in ("H2V_MESH_SHARD", "H2V_MSM"):
        monkeypatch.delenv(var, raising=False)
    params, vk, proofs = vm_proofs_k8
    bv = BatchVerifier(params, vk, mesh=make_mesh(3), rng=_lcg_rng())
    seen = _spy_dispatch(bv)
    res = bv.verify(proofs, localize=False)
    assert res.ok and res.num_proofs == len(proofs)
    assert seen == ["sharded_grouped"]
