#!/usr/bin/env python
"""Benchmark harness: batch proof verification throughput on the available
accelerator (real TPU chip under the driver; CPU otherwise).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): 10,000 k=14-class proofs/s on a v5e-16 with >=80%
scaling efficiency => 625 proofs/s/chip. vs_baseline is measured
steady-state proofs/s/chip against that 625/s/chip target. The reference
itself publishes no numbers (serial no_std Rust, BASELINE.md).

Workload: the k=14 mac_range circuit (BASELINE config 2 — lookups +
permutations + custom gate with rotation + instance column at k=14),
loaded from the committed fixture pack params/k14_mac_pack.npz (proving
one k=14 proof costs ~20 s in the test-only prover, so proofs are
pre-generated; benchmarks/gen_k14_pack.py regenerates/extends the pack).

Methodology: verification runs in the production serving mode —
BatchVerifier.verify_stream, which pipelines host transcript replay of
batch k+1 against the device MSMs of batch k (one pairing per batch,
AccumulatorStrategy algebra). The first stream batch compiles the MSM
kernel and fills the pipeline and is excluded; the measured figure is the
steady-state rate over the remaining batches.
"""

import hashlib
import json
import os
import sys
import time

BATCH = int(os.environ.get("H2V_BENCH_BATCH", "256"))
#                ^ proofs per stream batch (one device dispatch + pairing);
#                  batches larger than the fixture pack tile it (fresh
#                  random isolation weights keep the device work real)
NUM_BATCHES = int(os.environ.get("H2V_BENCH_NUM_BATCHES", "7"))
#                ^ first is compile/fill, the rest are measured

K = 14
ROWS = 8192
N_PUB = 32
PACK = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "params", "k14_mac_pack.npz")


def build_fixture(num_proofs: int):
    """Load the committed k=14 proof pack; instances are recomputed from
    the stored witness seeds and vk/params re-derived from the
    deterministic SRS (the pack's vk hash catches drift). Falls back to
    proving a smaller set live if the pack is missing."""
    import numpy as np

    from halo2_verifier_tpu.prover.circuits import mac_range_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.srs import load_srs

    srs = load_srs(K)
    spec, mk = mac_range_spec(K, ROWS, N_PUB)
    pk = keygen(spec, srs)
    params = srs.verifier_params()

    if os.path.exists(PACK):
        with np.load(PACK) as z:
            assert str(z["vk_sha256"]) == hashlib.sha256(
                pk.vk.to_bytes()).hexdigest(), (
                "fixture pack vk drifted — regenerate with "
                "benchmarks/gen_k14_pack.py")
            assert (int(z["k"]), int(z["rows"]), int(z["n_pub"])) == (
                K, ROWS, N_PUB)
            proofs = z["proofs"]
            seeds = z["seeds"]
        m = proofs.shape[0]
        # tile the pack past its size: repeated proofs get fresh random
        # isolation weights in the stream, so the device MSM work stays
        # real (only vk-shared bases dedup, same as for distinct proofs)
        batch = [
            (proofs[i % m].tobytes(), mk(int(seeds[i % m])).instance)
            for i in range(num_proofs)
        ]
        return params, pk.vk, batch

    # no pack: prove a reduced set live (slow path, keeps bench runnable)
    from halo2_verifier_tpu.prover.prove import create_proof
    from halo2_verifier_tpu.transcript import Blake2bWrite

    n = min(num_proofs, 32)
    batch = []
    for i in range(n):
        asg = mk(i)
        batch.append((
            create_proof(pk, [asg], Blake2bWrite(), seed=str(i).encode()),
            asg.instance,
        ))
    return params, pk.vk, batch


def _probe_device(timeout_s: int = 240) -> str:
    """Bounded platform probe in a subprocess: a wedged accelerator tunnel
    makes jax.devices() block forever (the relay dies if TPU clients are
    killed mid-op) — better one diagnostic JSON line than a silent hang."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if out.returncode == 0 and out.stdout.strip():
            return out.stdout.strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        return ""
    return ""


def main():
    platform = _probe_device()
    if not platform:
        print(json.dumps({
            "metric": "proofs_per_s_per_chip_batch_verify_k14",
            "value": 0.0,
            "unit": "proofs/s",
            "vs_baseline": 0.0,
            "detail": {"error": "accelerator unavailable: jax device "
                                "init did not respond (tunnel down?)"},
        }))
        return 1

    t0 = time.time()
    # BATCH distinct proofs: repeating a smaller fixture would understate
    # MSM work (identical commitments dedup into one entry). The stream
    # re-verifies the same batch with fresh random isolation weights each
    # round, which is computationally identical to a continuous feed of
    # distinct proofs of this circuit.
    params, vk, batch = build_fixture(BATCH)
    t_fixture = time.time() - t0

    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    bv = BatchVerifier(params, vk)

    def stream():
        for _ in range(NUM_BATCHES):
            yield batch

    t0 = time.time()
    gen = bv.verify_stream(stream(), localize=False)
    first = next(gen)  # compile + pipeline fill
    t_warm = time.time() - t0
    assert first.ok, "warmup batch failed to verify"
    bv.timings.totals.clear()
    bv.timings.counts.clear()
    bv.msm_entries_dispatched = 0

    t0 = time.time()
    results = list(gen)
    dt = time.time() - t0
    assert all(r.ok for r in results), "bench batch failed to verify"

    n_measured = (NUM_BATCHES - 1) * len(batch)
    proofs_per_s = n_measured / dt
    stages = bv.timings.report()
    device_s = sum(stages.get(s, {}).get("seconds", 0.0)
                   for s in ("device_msm_dispatch", "device_msm_collect"))
    msm_points_per_s = (
        round(bv.msm_entries_dispatched / device_s) if device_s else None
    )
    baseline_per_chip = 625.0  # 10k/s / 16 chips (BASELINE.md)
    out = {
        "metric": "proofs_per_s_per_chip_batch_verify_k14",
        "value": round(proofs_per_s, 3),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_s / baseline_per_chip, 5),
        "detail": {
            "proofs_measured": n_measured,
            "batch_size": len(batch),
            "steady_seconds": round(dt, 3),
            "compile_plus_first_batch_seconds": round(t_warm, 3),
            "fixture_seconds": round(t_fixture, 3),
            "circuit": (
                f"mac_range k={K} (lookup + permutation + rotation gate + "
                f"{N_PUB} public inputs) shplonk blake2b"
            ),
            "mode": "verify_stream (pipelined host replay / device MSM)",
            "msm_points_per_s": msm_points_per_s,
            "msm_entries": bv.msm_entries_dispatched,
            "stages": stages,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
