"""Multi-device (virtual 8-CPU mesh) and batch-orchestrator tests —
the distributed coverage the reference never needed (SURVEY.md §2.3)."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo2_verifier_tpu.ops import field_jax as fj
from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops.constants import G1_GEN, P, R
from halo2_verifier_tpu.ops.limbs import ints_to_limbs

rng = random.Random(5)


def _device_entries(scalars, points):
    S = jnp.asarray(ints_to_limbs([s % R for s in scalars]))
    X = jnp.asarray(
        ints_to_limbs([0 if p is None else p[0] * fj.FQ.mont_r % P
                       for p in points])
    )
    Y = jnp.asarray(
        ints_to_limbs([0 if p is None else p[1] * fj.FQ.mont_r % P
                       for p in points])
    )
    return S, X, Y


@pytest.mark.heavy_compile
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_msm_matches_single_chip():
    """Legacy full-scan sharded path (sharded_window_totals); the
    production window-sharded forest is covered by test_mesh_e2e's
    default set, so this compile-heavy variant is full-suite only."""
    from halo2_verifier_tpu.parallel.mesh import (
        make_mesh, pad_entries, sharded_msm,
    )

    n = 24
    scalars = [rng.randrange(R) for _ in range(n)]
    points = [hc.g1_mul(G1_GEN, rng.randrange(1, R)) for _ in range(n)]
    S, X, Y = _device_entries(scalars, points)
    mesh = make_mesh(8)
    S, X, Y = pad_entries(S, X, Y, 8)
    got = sharded_msm(mesh, S, X, Y)
    assert got == hc.g1_msm(scalars, points)


@pytest.fixture(scope="module")
def vm_batch():
    from halo2_verifier_tpu.prover.circuits import vector_mul_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.prover.srs import load_srs
    from halo2_verifier_tpu.transcript import Blake2bWrite

    srs = load_srs(8)
    spec, make_assignment = vector_mul_spec(8, 3)
    pk = keygen(spec, srs)
    proofs = []
    for i in range(3):
        asg = make_assignment([i + 2] * 3, [i + 5] * 3)
        proofs.append(
            (create_proof(pk, [asg], Blake2bWrite(), seed=str(i).encode()),
             asg.instance)
        )
    return srs.verifier_params(), pk.vk, proofs


def test_batch_verifier_device_msm(vm_batch):
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vk, proofs = vm_batch
    bv = BatchVerifier(params, vk)
    res = bv.verify(proofs, localize=False)
    assert res.ok and res.num_proofs == 3


def test_batch_verifier_localizes_bad_proof(vm_batch):
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    params, vk, proofs = vm_batch
    bad = list(proofs)
    # tamper an instance (proof bytes stay parseable)
    tampered_instance = [[(v + 1) % R for v in bad[1][1][0]]]
    bad[1] = (bad[1][0], tampered_instance)
    bv = BatchVerifier(params, vk)
    res = bv.verify(bad)
    assert not res.ok
    assert res.failed_indices == [1]


@pytest.mark.skipif(
    not os.environ.get("H2V_RUN_DRYRUN"),
    reason="duplicate of the driver's dryrun check; XLA-CPU accumulates "
    "compiler state over a long pytest process and segfaults on this "
    "compile late in the suite, so it must run in a fresh process: "
    "H2V_RUN_DRYRUN=1 pytest tests/test_parallel.py -k dryrun",
)
def test_graft_entry_dryrun():
    """Runs __graft_entry__.entry + dryrun_multichip in a FRESH interpreter
    (that is how the driver invokes it; see skip reason)."""
    import subprocess
    import sys

    script = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g;"
        "fn, args = g.entry();"
        "out = jax.jit(fn)(*args);"
        "assert out[0].shape[0] == 16;"
        "g.dryrun_multichip(8);"
        "print('DRYRUN_OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert "DRYRUN_OK" in res.stdout, res.stderr[-2000:]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_forest_matches_oracle():
    """Forest MSM sharded over points + windows (per-chip plans, bucket
    all_to_all exchange, tw/D bit-plane reduction per chip) must equal the
    exact host oracle for a two-group MSM with identities/duplicates."""
    from halo2_verifier_tpu.parallel.mesh import (
        combine_sharded_forest,
        make_mesh,
        sharded_forest_window_totals,
    )

    n = 40
    scalars = [rng.randrange(R) for _ in range(n)]
    # duplicates + identities across both groups
    pool = [hc.g1_mul(G1_GEN, 3 + i) for i in range(7)]
    points = [None if i % 11 == 10 else pool[i % 7] for i in range(n)]
    sizes = [17, 23]
    s_np = np.asarray(ints_to_limbs([s % R for s in scalars]))
    x_np = np.asarray(
        ints_to_limbs([0 if p is None else p[0] for p in points]))
    y_np = np.asarray(
        ints_to_limbs([0 if p is None else p[1] for p in points]))
    mesh = make_mesh(8)
    arr = sharded_forest_window_totals(mesh, x_np, y_np, s_np, sizes)
    got = combine_sharded_forest(arr, 2)
    want = [
        hc.g1_msm(scalars[:17], points[:17]),
        hc.g1_msm(scalars[17:], points[17:]),
    ]
    assert got == want


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_window_sharded_forest_matches_oracle():
    """Window-sharded forest (each chip plans windows [d*W/D,(d+1)*W/D)
    of every group over ALL points — no collective) must equal the exact
    host oracle, duplicates/identities included."""
    from halo2_verifier_tpu.parallel.mesh import (
        combine_sharded_windows,
        make_mesh,
        sharded_forest_by_windows,
    )

    n = 40
    scalars = [rng.randrange(R) for _ in range(n)]
    pool = [hc.g1_mul(G1_GEN, 11 + i) for i in range(7)]
    points = [None if i % 13 == 12 else pool[i % 7] for i in range(n)]
    sizes = [17, 23]
    s_np = np.asarray(ints_to_limbs([s % R for s in scalars]))
    x_np = np.asarray(
        ints_to_limbs([0 if p is None else p[0] for p in points]))
    y_np = np.asarray(
        ints_to_limbs([0 if p is None else p[1] for p in points]))
    mesh = make_mesh(8)
    arr = sharded_forest_by_windows(mesh, x_np, y_np, s_np, sizes)
    got = combine_sharded_windows(arr, 2)
    want = [
        hc.g1_msm(scalars[:17], points[:17]),
        hc.g1_msm(scalars[17:], points[17:]),
    ]
    assert got == want
