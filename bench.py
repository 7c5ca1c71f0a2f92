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

Degraded mode: if the accelerator tunnel never responds (bounded probe
with retries — the probe child is never killed: signalling a TPU client
mid-init can wedge the relay for the next client), the bench still emits a
measured PARTIAL result from a reduced CPU run (platform/degraded recorded
in detail) instead of a bare error object.
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

# ---------------------------------------------------------------- SoL model
# Speed-of-light accounting (BASELINE.md: "every limb-arithmetic kernel at
# speed-of-light per chip"). The MSM kernels are VPU-bound u32 limb
# arithmetic (no MXU use: 256-bit modular mults don't map to bf16 systolic
# tiles), so the bound is the VPU integer issue rate.
#
# v5e VPU peak: 8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12
# u32 ops/s (the optimistic all-ports-every-cycle number).
VPU_U32_OPS_PER_S = {"tpu": 3.85e12, "axon": 3.85e12}
# Analytic op count per RCB15 complete point add (ops/lmcurve.py add_body)
# on the 16x16-bit-limb Montgomery representation (ops/lmfield.py
# mont_mul_body, three convolutions with 2-pass carry folds):
#   mont_mul: conv T=a*b   16j x (16 mul + 16 and + 16 shr + 17+32 add) = 1552
#             fold2(32 rows)                                            = 192
#             conv m=T*N'  ~sum_j 5*(16-j)                              = 680
#             fold2(16 rows)                                            = 96
#             conv m*N     (nonzero N limbs ~16)                        = 1552
#             total/low-fold/carry/cond_sub                             ~ 365
#             ~= 4,437 u32 VPU ops (648 of them multiplies)
#   add_body: 12 mont_mul + 24 field add/sub (~85 ops each: 17-row add +
#             conditional subtract) ~= 12*4437 + 24*85 ~= 55,284 ops
U32_OPS_PER_MONT_MUL = 4437
U32_OPS_PER_POINT_ADD = 12 * U32_OPS_PER_MONT_MUL + 24 * 85


def _sol_detail(platform: str, point_adds: int, device_s: float):
    peak = VPU_U32_OPS_PER_S.get(platform)
    if peak is None or not device_s or not point_adds:
        return None
    sol_adds_per_s = peak / U32_OPS_PER_POINT_ADD
    measured = point_adds / device_s
    return {
        "point_adds_dispatched": point_adds,
        "measured_point_adds_per_s": round(measured),
        "sol_point_adds_per_s": round(sol_adds_per_s),
        "u32_ops_per_point_add": U32_OPS_PER_POINT_ADD,
        "vpu_u32_ops_per_s_peak": peak,
        "bound_pct": round(100.0 * measured / sol_adds_per_s, 2),
    }


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


def _probe_device() -> str:
    """Bounded platform probe with retries. A wedged accelerator tunnel
    makes jax.devices() block forever, and KILLING a TPU client mid-init
    can wedge the relay for the NEXT client — so the probe child is polled
    against a deadline and never signalled. Retry discipline: keep polling
    the same child across widening windows (one client at a time on the
    tunnel); only spawn a fresh child after the previous one EXITED
    nonzero. Total budget ~10 min across 3 windows."""
    import subprocess

    windows = [float(w) for w in os.environ.get(
        "H2V_BENCH_PROBE_WINDOWS", "240,180,180").split(",")]
    child = None
    for i, win in enumerate(windows):
        if child is None:
            child = subprocess.Popen(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, start_new_session=True,
            )
        deadline = time.time() + win
        while time.time() < deadline:
            rc = child.poll()
            if rc is not None:
                if rc == 0:
                    out = (child.stdout.read() or "").strip()
                    if out:
                        return out.splitlines()[-1]
                # child exited (crash/nonzero): a fresh attempt is safe
                child = None
                break
            time.sleep(2.0)
        if child is not None:
            print(f"bench: probe window {i + 1}/{len(windows)} "
                  f"({win:.0f}s) elapsed, child still initializing; "
                  "extending wait", file=sys.stderr)
        else:
            time.sleep(min(15.0 * (i + 1), 60.0))  # backoff before respawn
    if child is not None:
        # leave the hung child to finish on its own (never kill a TPU
        # client mid-init); it exits with the bench process group
        print("bench: probe never completed; falling back to CPU "
              "(degraded partial result)", file=sys.stderr)
    return ""


def _run_stream(params, vk, batch, num_batches):
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    bv = BatchVerifier(params, vk)

    def stream():
        for _ in range(num_batches):
            yield batch

    t0 = time.time()
    gen = bv.verify_stream(stream(), localize=False)
    first = next(gen)  # compile + pipeline fill
    t_warm = time.time() - t0
    assert first.ok, "warmup batch failed to verify"
    bv.timings.totals.clear()
    bv.timings.counts.clear()
    bv.msm_entries_dispatched = 0
    bv.point_adds_dispatched = 0

    t0 = time.time()
    results = list(gen)
    dt = time.time() - t0
    assert all(r.ok for r in results), "bench batch failed to verify"
    return bv, dt, t_warm


def main():
    platform = _probe_device()
    degraded = not platform
    if degraded:
        # partial-result mode: measure a reduced run on CPU rather than
        # erase the round's perf story with a bare error object.
        # sitecustomize imports jax at interpreter start with
        # JAX_PLATFORMS=axon, so the env var alone is too late — force the
        # live config like tests/conftest.py does.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        batch_n, num_batches = min(BATCH, 16), min(NUM_BATCHES, 3)
        platform = "cpu"
    else:
        batch_n, num_batches = BATCH, NUM_BATCHES

    t0 = time.time()
    # BATCH distinct proofs: repeating a smaller fixture would understate
    # MSM work (identical commitments dedup into one entry). The stream
    # re-verifies the same batch with fresh random isolation weights each
    # round, which is computationally identical to a continuous feed of
    # distinct proofs of this circuit.
    params, vk, batch = build_fixture(batch_n)
    t_fixture = time.time() - t0

    bv, dt, t_warm = _run_stream(params, vk, batch, num_batches)

    n_measured = (num_batches - 1) * len(batch)
    proofs_per_s = n_measured / dt
    stages = bv.timings.report()
    device_s = sum(stages.get(s, {}).get("seconds", 0.0)
                   for s in ("device_msm_dispatch", "device_msm_collect"))
    msm_points_per_s = (
        round(bv.msm_entries_dispatched / device_s) if device_s else None
    )
    baseline_per_chip = 625.0  # 10k/s / 16 chips (BASELINE.md)
    detail = {
        "platform": platform,
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
        "sol": _sol_detail(platform, bv.point_adds_dispatched, device_s),
        "stages": stages,
    }
    if degraded:
        detail["degraded"] = (
            "accelerator tunnel did not respond within the probe budget; "
            "this is a reduced CPU-mode partial result"
        )
    out = {
        "metric": "proofs_per_s_per_chip_batch_verify_k14",
        "value": round(proofs_per_s, 3),
        "unit": "proofs/s",
        "vs_baseline": round(proofs_per_s / baseline_per_chip, 5),
        "detail": detail,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
