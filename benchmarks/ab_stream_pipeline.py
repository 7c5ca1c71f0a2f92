"""In-process A/B of the stream finish-pipeline levers on the real chip.

The tunneled chip's per-batch times vary run to run (+-25%%,
prof_forest_path_r04), so cross-run bench comparisons can't resolve a
~20%% lever. This harness compiles ONCE and then interleaves
configurations {depth 1,2} x {D2H prefetch on,off} over the same proof
batch, several rounds each, reporting marginal ms/batch per config from
the same process/tunnel conditions.

    python benchmarks/ab_stream_pipeline.py [batch] [rounds_per_config]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run_stream(bv, batch, n, depth, prefetch):
    os.environ["H2V_STREAM_DEPTH"] = str(depth)
    os.environ["H2V_D2H_PREFETCH"] = "1" if prefetch else "0"

    def stream():
        for _ in range(n):
            yield batch

    t0 = time.time()
    results = list(bv.verify_stream(stream(), localize=False))
    dt = time.time() - t0
    assert all(r.ok for r in results)
    return dt / n


def main():
    batch_n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier

    timings = {}
    params, vk, batch = bench.build_fixture(batch_n, timings)
    bv = BatchVerifier(params, vk)
    # compile + warm every kernel once
    t0 = time.time()
    run_stream(bv, batch, 2, 2, True)
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    configs = [(1, False), (1, True), (2, False), (2, True)]
    acc = {c: [] for c in configs}
    for r in range(rounds):
        for c in configs:
            ms = run_stream(bv, batch, 6, *c) * 1e3
            acc[c].append(ms)
            print(f"round {r} depth={c[0]} prefetch={c[1]}: "
                  f"{ms:.1f} ms/batch", flush=True)
    out = {
        f"depth{d}_prefetch{int(p)}": {
            "ms_per_batch": round(sorted(acc[(d, p)])[len(acc[(d, p)]) // 2], 2),
            "all": [round(v, 1) for v in acc[(d, p)]],
            "proofs_per_s": round(batch_n / (sorted(acc[(d, p)])[len(acc[(d, p)]) // 2] / 1e3), 1),
        }
        for d, p in configs
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
