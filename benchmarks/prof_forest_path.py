"""Stage-level profile of the FOREST device MSM path at bench shapes.

The bench (k=14 mac_range, BATCH=256) dispatches ~4.4k entries/batch
across two accumulator sides. This isolates, on the real chip:
  plan (C++ planner) / enqueue (dispatch_planned python+uploads) /
  device wait (block_until_ready) / fetch (device->host) / host fold.

    python benchmarks/prof_forest_path.py [m_left m_right reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from halo2_verifier_tpu.ops import msm_jax, msm_forest  # noqa: E402
from halo2_verifier_tpu.ops.constants import R, G1_GEN  # noqa: E402
from halo2_verifier_tpu.ops import hostcurve as hc  # noqa: E402
from halo2_verifier_tpu.ops.limbs import ints_to_limbs  # noqa: E402


def main():
    m_left = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m_right = int(sys.argv[2]) if len(sys.argv) > 2 else 3840
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    total = m_left + m_right
    rng = np.random.RandomState(7)

    npts = 256
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    xs = np.asarray(ints_to_limbs([pts[i % npts][0] for i in range(total)]))
    ys = np.asarray(ints_to_limbs([pts[i % npts][1] for i in range(total)]))

    print(f"devices: {jax.devices()}")
    sizes = [m_left, m_right]

    def one_round(tag, fused=False, seed=None):
        r = np.random.RandomState(seed) if seed is not None else rng
        ss = np.asarray(ints_to_limbs(
            [int.from_bytes(r.bytes(32), "little") % R
             for _ in range(total)]
        ))
        t0 = time.time()
        plan = msm_forest.host_plan(ss, sizes)
        t_plan = time.time() - t0
        t0 = time.time()
        if fused == "fuse3":
            arr = msm_forest.dispatch_planned_fuse3(xs, ys, plan)
        elif fused:
            arr = msm_forest.dispatch_planned_fused(xs, ys, plan)
        else:
            arr = msm_forest.dispatch_planned(xs, ys, plan)
        t_enq = time.time() - t0
        t0 = time.time()
        arr.block_until_ready()
        t_dev = time.time() - t0
        t0 = time.time()
        arr_np = np.asarray(arr)
        t_fetch = time.time() - t0
        t0 = time.time()
        out = []
        for gi in range(2):
            sl = slice(gi * msm_jax.NUM_WINDOWS, (gi + 1) * msm_jax.NUM_WINDOWS)
            out.append(msm_jax.combine_window_totals(
                tuple(arr_np[c][:, sl] for c in range(3))
            ))
        t_fold = time.time() - t0
        n_lvl = len(plan["levels"])
        print(f"{tag}: plan {t_plan*1e3:6.1f}  enq {t_enq*1e3:6.1f}  "
              f"dev {t_dev*1e3:6.1f}  fetch {t_fetch*1e3:6.1f}  "
              f"fold {t_fold*1e3:6.1f} ms   (levels={n_lvl} "
              f"adds={plan['adds']} tw={plan['tw']})")
        return out

    modes = os.environ.get("H2V_PROF_MODES", "flat,fuse3").split(",")
    outs = {}
    for mode in modes:
        fused = {"flat": False, "fused": True, "fuse3": "fuse3"}[mode]
        one_round(f"{mode}-warmup0", fused=fused)
        one_round(f"{mode}-warmup1", fused=fused)
        outs[mode] = [
            one_round(f"{mode}-round{i}", fused=fused, seed=100 + i)
            for i in range(reps)
        ]
    ref = outs[modes[0]]
    for mode in modes[1:]:
        for b, f in zip(ref, outs[mode]):
            assert b == f, f"{mode} path result mismatch"
    if len(modes) > 1:
        print(f"results match across modes: {modes}")


if __name__ == "__main__":
    main()
