"""Profile the addition-forest MSM (ops/msm_forest.py) at bench-like
shapes on the available chip, stage by stage: host plan, upload+dispatch,
device wall time, fetch, host fold. Compare with prof_msm_stages.py (the
segmented-scan path) at the same shapes.

    python benchmarks/prof_msm_forest.py [m_left m_right]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from halo2_verifier_tpu.ops import hostcurve as hc  # noqa: E402
from halo2_verifier_tpu.ops import msm_forest, msm_jax  # noqa: E402
from halo2_verifier_tpu.ops.constants import G1_GEN, R  # noqa: E402
from halo2_verifier_tpu.ops.limbs import ints_to_limbs  # noqa: E402


def main():
    m_left = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m_right = int(sys.argv[2]) if len(sys.argv) > 2 else 6912
    total = m_left + m_right
    rng = np.random.RandomState(7)

    npts = 256
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    xs = np.asarray(ints_to_limbs([pts[i % npts][0] for i in range(total)]))
    ys = np.asarray(ints_to_limbs([pts[i % npts][1] for i in range(total)]))
    ss = np.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % R for _ in range(total)]
    ))
    sizes = [m_left, m_right]

    t0 = time.time()
    plan = msm_forest.host_plan(ss, sizes)
    t_plan = time.time() - t0
    widths = [lv[0].shape[0] for lv in plan["levels"]]
    print(f"host_plan: {t_plan*1e3:.1f} ms — entries={plan['entries']} "
          f"adds={plan['adds']} levels={len(widths)} widths={widths}")

    # compile + correctness once
    t0 = time.time()
    arr = msm_forest.dispatch_planned(xs, ys, plan)
    np.asarray(arr)
    print(f"compile+first run: {time.time()-t0:.1f} s")

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        arr = msm_forest.dispatch_planned(xs, ys, plan)
        arr.block_until_ready()
    t_disp = (time.time() - t0) / reps
    print(f"dispatch+device: {t_disp*1e3:.1f} ms/call")

    t0 = time.time()
    for _ in range(reps):
        np.asarray(arr)
    print(f"fetch: {(time.time()-t0)/reps*1e3:.1f} ms")

    t0 = time.time()
    got = msm_jax.combine_window_totals_grouped(arr, 2)
    print(f"host fold: {(time.time()-t0)*1e3:.1f} ms")

    print("checking vs host oracle ...")
    from halo2_verifier_tpu.ops.limbs import limbs_to_ints

    s_int = limbs_to_ints(ss)
    want = [
        hc.g1_msm(s_int[:m_left], [pts[i % npts] for i in range(m_left)]),
        hc.g1_msm(s_int[m_left:],
                  [pts[i % npts] for i in range(m_left, total)]),
    ]
    assert got == want, "forest result mismatch vs host oracle"
    print("ok")


if __name__ == "__main__":
    main()
