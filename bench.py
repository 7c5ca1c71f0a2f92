#!/usr/bin/env python
"""Benchmark harness: batch proof verification throughput on the available
accelerator (real TPU chip under the driver; CPU otherwise).

Prints JSON lines: {"metric", "value", "unit", "vs_baseline", "detail"}.
The LAST complete line is the result. Intermediate milestones (probe done,
fixture built, warmup done, each measured batch) each print a fully valid
line with detail.partial set, so a hard timeout at ANY point still leaves
a parseable, honest artifact of everything measured up to that moment.

Baseline (BASELINE.md): 10,000 k=14-class proofs/s on a v5e-16 with >=80%
scaling efficiency => 625 proofs/s/chip. vs_baseline is measured
steady-state proofs/s/chip against that 625/s/chip target. The reference
itself publishes no numbers (serial no_std Rust, BASELINE.md).

Workload: the k=14 mac_range circuit (BASELINE config 2 — lookups +
permutations + custom gate with rotation + instance column at k=14),
loaded from the committed fixture pack params/k14_mac_pack.npz and the
committed deterministic SRS params/kzg_bn254_14.srs (proving one k=14
proof costs ~20 s in the test-only prover, so proofs are pre-generated;
benchmarks/gen_k14_pack.py regenerates/extends the pack).

Methodology: verification runs in the production serving mode —
BatchVerifier.verify_stream, which pipelines host transcript replay of
batch k+1 against the device MSMs of batch k (one pairing per batch,
AccumulatorStrategy algebra). The first stream batch compiles the MSM
kernel and fills the pipeline and is excluded; the measured figure is the
steady-state rate over the remaining batches.

Self-deadline: the whole run fits H2V_BENCH_DEADLINE seconds (default
520). The probe budget and the number of measured batches adapt to the
time remaining; the run ends early with whatever it measured rather than
letting an external timeout erase the result. Cold-start budget on the
real chip: ~450 s of XLA/Mosaic compiles at BATCH=1024 shapes, then
~0.25 s per measured batch.

Compile cache: enabled only for CPU (degraded) runs. On the tunneled TPU
backend cache WRITES work but READS hang intermittently, which is
strictly worse than the cold compile — see _enable_compile_cache.

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

T0 = time.time()
DEADLINE = float(os.environ.get("H2V_BENCH_DEADLINE", "520"))

BATCH = int(os.environ.get("H2V_BENCH_BATCH", "1024"))
#                ^ proofs per stream batch (one device dispatch + pairing);
#                  batches larger than the fixture pack tile it (fresh
#                  random isolation weights keep the device work real).
#                  1024 is the measured throughput knee on v5e: per-batch
#                  fixed costs (launch chain, fetch RTT, pairing)
#                  amortize ~2x over 256 while 2048 adds only warmup time
#                  (see benchmarks/RESULTS.md r04 batch sweep)
NUM_BATCHES = int(os.environ.get("H2V_BENCH_NUM_BATCHES", "25"))
#                ^ first is compile/fill, the rest are measured (fewer if
#                  the self-deadline would be exceeded). 24 measured
#                  batches (~25k proofs, ~6-12 s steady) because the
#                  tunneled chip's per-batch wall swings +-40% minute to
#                  minute (RESULTS.md r04 noise note): 8-batch windows
#                  measured anywhere from 2.2k to 4.8k proofs/s for
#                  identical code, a wider window stabilizes the marginal
#                  rate. Warmup is AOT-pack-backed (~10 s), so the run
#                  still fits the 520 s self-deadline many times over.

K = 14
ROWS = 8192
N_PUB = 32
REPO = os.path.dirname(os.path.abspath(__file__))
PACK = os.path.join(REPO, "params", "k14_mac_pack.npz")
CACHE_DIR = os.path.join(REPO, ".jax_cache")

BASELINE_PER_CHIP = 625.0  # 10k/s / 16 chips (BASELINE.md)


def _remaining() -> float:
    return DEADLINE - (time.time() - T0)


def emit(value, detail, partial=None):
    """Print one fully-formed result line (the driver records the tail;
    the last complete line wins). `partial` is a short stage note for
    intermediate lines; the final line omits it."""
    d = dict(detail)
    if partial:
        d["partial"] = partial
    d["elapsed_seconds"] = round(time.time() - T0, 3)
    print(json.dumps({
        "metric": "proofs_per_s_per_chip_batch_verify_k14",
        "value": round(float(value), 3),
        "unit": "proofs/s",
        "vs_baseline": round(float(value) / BASELINE_PER_CHIP, 5),
        "detail": d,
    }), flush=True)


def _enable_compile_cache(platform: str):
    """Persistent XLA compile cache — CPU (degraded) runs only.

    Measured on the axon (tunneled TPU) backend: cache WRITES work and
    cross-process keys are stable, but cache READS hang intermittently
    (minutes-long stalls mid-get; same family as the zstd-reader
    segfaults noted in tests/conftest.py). A hung read mid-warmup is
    strictly worse than the ~315 s cold compile (post-fori_loop-fix,
    measured 2026-08-21), so the accelerator path stays cache-less and
    relies on the self-deadline + incremental output instead.
    H2V_BENCH_CACHE=1 forces it on for experiments; =0 forces off."""
    force = os.environ.get("H2V_BENCH_CACHE")
    if force == "0" or (force != "1" and platform != "cpu"):
        return False
    try:
        import jax
        import jax._src.compilation_cache as _cc

        _cc.zstandard = None  # force the zlib codec both ways
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # cache is an optimization, never a blocker
        print(f"bench: compile cache unavailable ({e})", file=sys.stderr)
        return False


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


def build_fixture(num_proofs: int, timings: dict):
    """Load the committed k=14 proof pack; instances are recomputed from
    the stored witness seeds and vk/params re-derived from the committed
    deterministic SRS (the pack's vk hash catches drift). Falls back to
    proving a smaller set live if the pack is missing."""
    import numpy as np

    from halo2_verifier_tpu.prover.circuits import mac_range_spec
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.srs import load_srs

    t = time.time()
    srs = load_srs(K)
    timings["srs_seconds"] = round(time.time() - t, 3)
    t = time.time()
    spec, mk = mac_range_spec(K, ROWS, N_PUB)
    pk = keygen(spec, srs)
    timings["keygen_seconds"] = round(time.time() - t, 3)
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
    nonzero. The budget shrinks to fit the self-deadline."""
    import subprocess

    windows = [float(w) for w in os.environ.get(
        "H2V_BENCH_PROBE_WINDOWS", "90,90").split(",")]
    budget_end = time.time() + max(30.0, 0.4 * _remaining())
    child = None
    for i, win in enumerate(windows):
        if child is None:
            child = subprocess.Popen(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True, start_new_session=True,
            )
        deadline = min(time.time() + win, budget_end)
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
        if time.time() >= budget_end:
            break
        if child is not None:
            print(f"bench: probe window {i + 1}/{len(windows)} "
                  f"({win:.0f}s) elapsed, child still initializing; "
                  "extending wait", file=sys.stderr)
        else:
            time.sleep(min(15.0 * (i + 1), 30.0))  # backoff before respawn
    if child is not None:
        # leave the hung child to finish on its own (never kill a TPU
        # client mid-init); it exits with the bench process group
        print("bench: probe never completed; falling back to CPU "
              "(degraded partial result)", file=sys.stderr)
    return ""


def run_extras(platform):
    """H2V_BENCH_EXTRA=1: two additional measured configurations
    (VERDICT r04 item 8) — each emits its own JSON line BEFORE the main
    metric's final line, so the driver's tail-line contract holds.

    1. keccak256 x gwc on the k=9 mac circuit — the EVM-shaped config
       (the reason Keccak256Read exists, transcript/mod.rs:239-254;
       multiopen/gwc.rs:54-135).
    2. heterogeneous-vk stream — k=9 mac + k=9 vector_mul proofs mixed
       in one batch (BASELINE config 4), sharing the device MSMs and the
       single pairing across circuits.

    Both assert the VM raw fast path actually served the stream
    (host_assemble stage present): a regression in _stream_groups'
    eligibility would otherwise silently fall back to the slow path and
    show up only as a perf cliff."""
    import numpy as np  # noqa: F401

    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier
    from halo2_verifier_tpu.prover.circuits import (
        mac_range_spec,
        vector_mul_spec,
    )
    from halo2_verifier_tpu.prover.fixtures import load_or_build_pack
    from halo2_verifier_tpu.prover.keygen import keygen
    from halo2_verifier_tpu.prover.srs import load_srs

    bsz = int(os.environ.get("H2V_BENCH_EXTRA_BATCH", "256"))
    nb = int(os.environ.get("H2V_BENCH_EXTRA_BATCHES", "7"))

    srs = load_srs(9)
    params = srs.verifier_params()
    mac_spec, mac_mk = mac_range_spec(9, 300, 10)
    mac_pk = keygen(mac_spec, srs)
    vm_spec, vm_mk_raw = vector_mul_spec(9, 4)
    vm_pk = keygen(vm_spec, srs)

    def vm_mk(s):
        return vm_mk_raw([int(s) + 2] * 4, [int(s) + 5] * 4)

    def measure(name, bv, batch, circuit):
        def stream():
            for _ in range(nb):
                yield batch

        gen = bv.verify_stream(stream(), localize=False)
        t0 = time.time()
        first = next(gen)
        assert first.ok, f"{name}: warmup batch failed"
        warm_s = time.time() - t0
        t0 = time.time()
        n = 0
        for r in gen:
            assert r.ok, f"{name}: batch failed"
            n += len(batch)
        dt = time.time() - t0
        assert "host_assemble" in bv.timings.totals, (
            f"{name}: VM raw fast path NOT used (stream fell back)")
        print(json.dumps({
            "metric": name,
            "value": round(n / dt, 3),
            "unit": "proofs/s",
            "vs_baseline": round(n / dt / BASELINE_PER_CHIP, 5),
            "detail": {
                "platform": platform, "circuit": circuit,
                "batch_size": len(batch), "proofs_measured": n,
                "warmup_seconds": round(warm_s, 3),
                "steady_seconds": round(dt, 3),
                "fast_path": "vm_raw",
            },
        }), flush=True)

    # 1. keccak x gwc
    kg_pack = load_or_build_pack(
        "bench_mac_k9_keccak_gwc_pack", mac_pk, mac_mk, list(range(16)),
        hash_name="keccak256", multiopen="gwc",
    )
    batch = [kg_pack[i % len(kg_pack)] for i in range(bsz)]
    bv = BatchVerifier(params, mac_pk.vk, multiopen="gwc",
                       hash_name="keccak256")
    measure("proofs_per_s_keccak_gwc_mac_k9", bv, batch,
            "mac_range k=9 keccak256 gwc")

    # 2. heterogeneous-vk stream (mac + vector_mul, same SRS)
    mac_pack = load_or_build_pack(
        "bench_mac_k9_pack", mac_pk, mac_mk, list(range(8)))
    vm_pack = load_or_build_pack(
        "bench_vm_k9_pack", vm_pk, vm_mk, list(range(8)))
    items = []
    for i in range(bsz):
        if i % 2 == 0:
            p, inst = mac_pack[(i // 2) % len(mac_pack)]
            items.append((p, inst, mac_pk.vk))
        else:
            p, inst = vm_pack[(i // 2) % len(vm_pack)]
            items.append((p, inst, vm_pk.vk))
    bv = BatchVerifier(params, vk=None)
    measure("proofs_per_s_hetero_vk_stream_k9", bv, items,
            "mac_range k=9 + vector_mul k=9 mixed per batch (2 vks)")


def main():
    detail = {"deadline_seconds": DEADLINE}
    emit(0.0, detail, partial="start: probing accelerator")
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
        detail["degraded"] = (
            "accelerator tunnel did not respond within the probe budget; "
            "this is a reduced CPU-mode partial result"
        )
    else:
        batch_n, num_batches = BATCH, NUM_BATCHES
    detail["platform"] = platform
    detail["compile_cache"] = _enable_compile_cache(platform)
    emit(0.0, detail, partial="probe done: building fixture")

    t0 = time.time()
    # BATCH distinct proofs: repeating a smaller fixture would understate
    # MSM work (identical commitments dedup into one entry). The stream
    # re-verifies the same batch with fresh random isolation weights each
    # round, which is computationally identical to a continuous feed of
    # distinct proofs of this circuit.
    fixture_timings = {}
    params, vk, batch = build_fixture(batch_n, fixture_timings)
    detail.update(fixture_timings)
    detail["fixture_seconds"] = round(time.time() - t0, 3)
    detail["batch_size"] = len(batch)
    detail["circuit"] = (
        f"mac_range k={K} (lookup + permutation + rotation gate + "
        f"{N_PUB} public inputs) shplonk blake2b"
    )
    detail["mode"] = "verify_stream (pipelined host replay / device MSM)"
    emit(0.0, detail, partial="fixture built: compiling + warmup batch")

    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    try:
        # warm-start status: committed AOT executables for this device
        # fingerprint (utils/aotcache.py) — when present, the stream
        # kernels load in ~0.1 s each instead of ~20-30 s compiles
        from halo2_verifier_tpu.utils.aotcache import pack_inventory

        inv = pack_inventory()
        detail["aot"] = {"entries": inv["entries"],
                         "mb": round(inv["bytes"] / 1e6, 1)}
    except Exception:
        pass

    bv = BatchVerifier(params, vk)
    state = {"served": 0}

    def stream():
        # first batch = compile + pipeline fill; afterwards keep feeding
        # while the self-deadline allows. verify_stream holds a one-batch
        # lookahead, so stop ~2.5 batch-times before the wall.
        for i in range(num_batches):
            if i >= 2 and state.get("batch_s"):
                if _remaining() < 2.5 * state["batch_s"] + 10.0:
                    print(f"bench: self-deadline — stopping after "
                          f"{i} batches", file=sys.stderr)
                    return
            state["served"] = i + 1
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
    detail["compile_plus_first_batch_seconds"] = round(t_warm, 3)
    # lower-bound estimate so a timeout right after warmup still records a
    # measured (if pessimistic, compile-inclusive) rate
    emit(len(batch) / t_warm, detail,
         partial="warmup done: measuring steady state")

    t0 = time.time()
    n_measured = 0
    t_first_batch = None  # completion time of the 1st measured batch
    for r in gen:
        assert r.ok, "bench batch failed to verify"
        n_measured += len(batch)
        dt = time.time() - t0
        state["batch_s"] = dt / (n_measured // len(batch))
        cumulative = n_measured / dt
        if t_first_batch is None:
            t_first_batch = time.time()
        # primary value = MARGINAL steady rate over batches 2..k: the
        # first measured batch still contains pipeline fill (its replay
        # overlapped the warmup batch's device work), which drags the
        # cumulative figure ~1.6-2x below the machine's steady rate
        # (benchmarks/RESULTS.md r04 sweep; VERDICT r04 weak #2). With
        # only one measured batch the cumulative rate is all we have.
        marginal_dt = time.time() - t_first_batch
        if n_measured > len(batch) and marginal_dt > 0:
            proofs_per_s = (n_measured - len(batch)) / marginal_dt
            detail["rate_basis"] = (
                "marginal over measured batches 2..k (first measured "
                "batch contains pipeline fill)"
            )
        else:
            proofs_per_s = cumulative
            detail["rate_basis"] = "cumulative (single measured batch)"
        detail["value_cumulative"] = round(cumulative, 3)
        stages = bv.timings.report()
        device_s = sum(stages.get(s, {}).get("seconds", 0.0)
                       for s in ("device_msm_dispatch",
                                 "device_msm_collect"))
        detail["proofs_measured"] = n_measured
        detail["steady_seconds"] = round(dt, 3)
        detail["msm_points_per_s"] = (
            round(bv.msm_entries_dispatched / device_s) if device_s
            else None
        )
        detail["msm_entries"] = bv.msm_entries_dispatched
        detail["sol"] = _sol_detail(platform, bv.point_adds_dispatched,
                                    device_s)
        detail["stages"] = stages
        done = (n_measured // len(batch)) >= state["served"] - 1
        emit(proofs_per_s, detail,
             partial=None if done else
             f"measured {n_measured // len(batch)} steady batches")
    if os.environ.get("H2V_BENCH_EXTRA") == "1":
        run_extras(platform)
        # the driver records the LAST line: re-emit the headline metric
        emit(proofs_per_s, detail)
    return 0


if __name__ == "__main__":
    sys.exit(main())
