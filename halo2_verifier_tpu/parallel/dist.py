"""Multi-host (DCN) process-group plumbing — BASELINE config 5.

The reference is a single-threaded no_std library with no IPC at all
(SURVEY.md §2.3: `parallelize` in halo2_verifier/src/arithmetic.rs:127-134
is a serial stub). The TPU-native equivalent of "scale past one host" is
NOT a custom transport: `jax.distributed.initialize` forms the process
group over DCN, every process then sees the GLOBAL device list, and the
same shard_map/pjit programs used intra-slice (parallel/mesh.py) run
unchanged — XLA routes collectives over ICI within a slice and DCN across
hosts.

Environment-driven bring-up (one process per host, all started with the
same command):

    H2V_COORDINATOR=host0:12345 H2V_NUM_PROCESSES=4 H2V_PROCESS_ID=k ...

or the standard JAX service variables (COORDINATOR_ADDRESS etc.) / cloud
auto-detection, which ``jax.distributed.initialize()`` handles natively
when our explicit vars are absent.

Tested with a real 2-process × 4-virtual-CPU-device group (Gloo over
loopback DCN) in tests/test_multihost.py.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def is_multiprocess() -> bool:
    """True once a multi-host process group is live."""
    import jax

    return _INITIALIZED or jax.process_count() > 1


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Join (or form) the multi-host process group. Idempotent.

    Resolution order per field: explicit argument > H2V_* env var > None
    (= let jax.distributed auto-detect from its own env/cloud metadata).
    Returns True if a process group is live after the call, False if no
    configuration was found (single-host mode — not an error: every
    single-chip/single-host path works without this).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True

    coordinator = coordinator or os.environ.get("H2V_COORDINATOR")
    if num_processes is None:
        n = os.environ.get("H2V_NUM_PROCESSES")
        num_processes = int(n) if n else None
    if process_id is None:
        p = os.environ.get("H2V_PROCESS_ID")
        process_id = int(p) if p else (0 if p == "0" else None)
    if local_device_ids is None:
        ids = os.environ.get("H2V_LOCAL_DEVICE_IDS")
        local_device_ids = ([int(i) for i in ids.split(",")]
                            if ids else None)

    import jax

    if coordinator is None and "COORDINATOR_ADDRESS" not in os.environ:
        # no explicit config; only auto-init when jax can infer a cluster
        # (cloud metadata) — otherwise stay single-host
        return False

    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def shutdown() -> None:
    global _INITIALIZED
    if _INITIALIZED:
        import jax

        jax.distributed.shutdown()
        _INITIALIZED = False


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) of the live group (0, 1 single-host)."""
    import jax

    return jax.process_index(), jax.process_count()


def make_global_mesh(n_devices: int | None = None, axis: str = "points"):
    """A mesh over the GLOBAL device list (all hosts). Device order is
    jax.devices() — process-major, so contiguous 'points' shards land on
    one host and the bucket all_to_all crosses DCN only at shard
    boundaries. Drop-in for mesh.make_mesh on multi-host deployments."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))
