"""Multi-host (DCN) process-group bring-up — BASELINE config 5 readiness.

Launches a REAL 2-process group over loopback (Gloo DCN emulation), each
process holding 4 virtual CPU devices, and proves:
  * jax.distributed.initialize plumbing (parallel/dist.py) forms the group
    from H2V_* env vars alone;
  * every process sees the 8-device GLOBAL mesh (jax.devices() spans hosts);
  * a shard_map collective (psum) crosses the process boundary and agrees
    with the single-host value;
  * an all_to_all — the collective the sharded forest MSM rides
    (parallel/mesh.py bucket exchange) — runs across hosts.

The reference has no analogue (no IPC at all, SURVEY §2.3); this is the
TPU-native substitute for NCCL/MPI bootstrap.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

from halo2_verifier_tpu.parallel import dist

assert dist.init_distributed(), "env-driven init failed"
pid, nproc = dist.process_info()
assert nproc == 2, nproc

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

mesh = dist.make_global_mesh()
assert mesh.devices.size == 8, mesh.devices.size
assert len(jax.local_devices()) == 4

@jax.jit
def psum_all(a):
    return jax.shard_map(lambda x: jax.lax.psum(x, "points"),
                         mesh=mesh, in_specs=P("points"),
                         out_specs=P())(a)

arr = jnp.arange(16, dtype=jnp.int32)
# shard i holds rows [2i, 2i+1]; psum reduces across all 8 shards (both
# hosts). out_specs=P() -> fully replicated, so device_get is legal.
expect = np.arange(16, dtype=np.int32).reshape(8, 2).sum(axis=0)
got = np.asarray(jax.device_get(psum_all(arr)))
assert (got == expect).all(), (got, expect)

@jax.jit
def a2a(a):
    return jax.shard_map(
        lambda x: jax.lax.all_to_all(x, "points", split_axis=1,
                                     concat_axis=0, tiled=True),
        mesh=mesh, in_specs=P("points"), out_specs=P("points"))(a)

m = jnp.arange(64, dtype=jnp.int32).reshape(8, 8)
out = a2a(m)
# per-device input (1,8) tiled-splits into 8 width-1 pieces concat on
# axis 0 -> per-device (8,1): device d ends with COLUMN d of the global
# matrix; globally that is m.T flattened to (64,1). The result spans both
# processes, so check only this process's addressable shards.
expect_global = np.arange(64, dtype=np.int32).reshape(8, 8).T.reshape(64, 1)
for shard in out.addressable_shards:
    r0 = shard.index[0].start or 0
    local = np.asarray(shard.data)
    assert (local == expect_global[r0:r0 + local.shape[0]]).all(), (
        pid, r0, local)

print(f"MULTIHOST_OK pid={pid} nproc={nproc}", flush=True)
dist.shutdown()
"""

# The PRODUCTION leg: the window-sharded forest MSM and a full
# BatchVerifier verification run on the 2-process global mesh — the same
# code path as single-process (parallel/mesh.py to_global/fetch_global
# handle cross-process placement), differentially checked against the
# exact host oracle and the pairing verdict.
WORKER_MSM = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["H2V_MESH_SHARD"] = "windows"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

from halo2_verifier_tpu.parallel import dist

assert dist.init_distributed(), "env-driven init failed"
pid, nproc = dist.process_info()
assert nproc == 2, nproc

import numpy as np

mesh = dist.make_global_mesh()
assert mesh.devices.size == 8, mesh.devices.size

# 1. production sharded MSM vs exact host oracle, across processes
from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops.constants import G1_GEN, R
from halo2_verifier_tpu.ops.limbs import ints_to_limbs
from halo2_verifier_tpu.parallel.mesh import (
    combine_sharded_windows, sharded_forest_by_windows)

rng = np.random.RandomState(7)
n = 24
scalars = [int(rng.randint(1, 1 << 61)) for _ in range(n)]
pts = [hc.g1_mul(G1_GEN, 5 + 3 * i) for i in range(n)]
s_np = np.asarray(ints_to_limbs([s %% R for s in scalars]))
x_np = np.asarray(ints_to_limbs([p[0] for p in pts]))
y_np = np.asarray(ints_to_limbs([p[1] for p in pts]))
arr = sharded_forest_by_windows(mesh, x_np, y_np, s_np, [n])
got = combine_sharded_windows(arr, 1)[0]
assert got == hc.g1_msm(scalars, pts), "cross-process MSM != host oracle"
print(f"MULTIHOST_MSM_OK pid={pid}", flush=True)

# 2. full batch verification on the global mesh: real proofs in, sharded
# MSMs across both processes, one pairing verdict out. The isolation-
# weight rng is deterministic so both processes assemble IDENTICAL global
# MSM inputs (SPMD requirement, see parallel/mesh.py to_global).
from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier
from halo2_verifier_tpu.prover.fixtures import vm_k8_batch

params, vk, batch = vm_k8_batch()
state = {"x": 0x5DEECE66D}
def _rng():
    state["x"] = (6364136223846793005 * state["x"]
                  + 1442695040888963407) %% (1 << 64)
    return 1 + state["x"] %% (R - 1)
bv = BatchVerifier(params, vk, mesh=mesh, rng=_rng)
res = bv.verify(batch, localize=False)
assert res.ok and res.num_proofs == len(batch), res
print(f"MULTIHOST_VERIFY_OK pid={pid} n={res.num_proofs}", flush=True)
dist.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_group_over_loopback_dcn(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": REPO})
    port = _free_port()

    def env_for(pid):
        env = dict(os.environ)
        env.update({
            "H2V_COORDINATOR": f"127.0.0.1:{port}",
            "H2V_NUM_PROCESSES": "2",
            "H2V_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
        })
        return env

    procs = [
        subprocess.Popen([sys.executable, str(worker)], env=env_for(pid),
                         cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}:\n{out}"
        assert f"MULTIHOST_OK pid={pid} nproc=2" in out, out


@pytest.mark.heavy_compile
def test_production_msm_and_verify_across_processes(tmp_path):
    """The PRODUCTION path on the 2-process global mesh: the window-sharded
    forest MSM differentially vs the host oracle, then a full
    BatchVerifier.verify of real proofs (VERDICT r03 missing #3 — the
    collectives were proven cross-process, the MSM/verification program
    was not)."""
    worker = tmp_path / "worker_msm.py"
    worker.write_text(WORKER_MSM % {"repo": REPO})
    port = _free_port()

    def env_for(pid):
        env = dict(os.environ)
        env.update({
            "H2V_COORDINATOR": f"127.0.0.1:{port}",
            "H2V_NUM_PROCESSES": "2",
            "H2V_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
        })
        return env

    procs = [
        subprocess.Popen([sys.executable, str(worker)], env=env_for(pid),
                         cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}:\n{out}"
        assert f"MULTIHOST_MSM_OK pid={pid}" in out, out
        assert f"MULTIHOST_VERIFY_OK pid={pid} n=3" in out, out


def test_single_host_mode_is_default():
    """Without any H2V_*/COORDINATOR env, init is a no-op (returns False)
    and nothing breaks — single-host users never touch this module."""
    from halo2_verifier_tpu.parallel import dist

    for var in ("H2V_COORDINATOR", "COORDINATOR_ADDRESS"):
        assert var not in os.environ
    assert dist.init_distributed() is False
