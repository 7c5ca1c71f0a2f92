"""Stage-level profile of the grouped device MSM on the available chip.

Times the full grouped window-totals kernel at bench-like shapes, then
variants that isolate stages (levels=0 cuts the segmented scan; a
windows-only fetch isolates transfer). Run on the real chip:

    python benchmarks/prof_msm_stages.py [m_left m_right]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from halo2_verifier_tpu.ops import msm_jax  # noqa: E402
from halo2_verifier_tpu.ops.constants import P, R  # noqa: E402
from halo2_verifier_tpu.ops import hostcurve as hc  # noqa: E402
from halo2_verifier_tpu.ops.limbs import ints_to_limbs  # noqa: E402


def main():
    m_left = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    m_right = int(sys.argv[2]) if len(sys.argv) > 2 else 6912
    total = m_left + m_right
    rng = np.random.RandomState(7)

    from halo2_verifier_tpu.ops.constants import G1_GEN
    from halo2_verifier_tpu.ops.field_jax import FQ

    # a few hundred distinct points tiled to `total` (point values don't
    # change the cost; scalars must be full-width random for real digit
    # distributions)
    npts = 256
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    xs = np.asarray(ints_to_limbs([pts[i % npts][0] for i in range(total)]))
    ys = np.asarray(ints_to_limbs([pts[i % npts][1] for i in range(total)]))
    ss = np.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % R for i in range(total)]
    ))

    sizes = [m_left, m_right]
    t0 = time.time()
    idx_sorted, keys_sorted, levels = msm_jax.host_plan(ss, sizes)
    t_plan = time.time() - t0
    print(f"host_plan: {t_plan*1e3:.1f} ms (m={total}, levels={levels})")

    jx = jax.jit(msm_jax.window_totals_presorted_impl,
                 static_argnames=("total_windows", "levels", "backend"))

    def timed(levels_, label):
        args = (xs, ys, idx_sorted, keys_sorted)
        t0 = time.time()
        out = jx(*[np.asarray(a) for a in args],
                 total_windows=2 * msm_jax.NUM_WINDOWS, levels=levels_)
        out.block_until_ready()
        t_compile = time.time() - t0
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = jx(*[np.asarray(a) for a in args],
                     total_windows=2 * msm_jax.NUM_WINDOWS, levels=levels_)
            out.block_until_ready()
        dt = (time.time() - t0) / reps
        print(f"{label}: {dt*1e3:.1f} ms/call (compile {t_compile:.1f}s)")
        return out, dt

    full, t_full = timed(levels, f"full kernel (levels={levels})")
    _, t_l0 = timed(0, "levels=0 (no segmented scan)")
    print(f"  => segmented scan ~ {(t_full - t_l0)*1e3:.1f} ms")

    # fetch cost
    t0 = time.time()
    for _ in range(5):
        np.asarray(full)
    print(f"fetch (3,16,{2*msm_jax.NUM_WINDOWS}): "
          f"{(time.time()-t0)/5*1e3:.1f} ms")

    # host fold cost
    t0 = time.time()
    pts_out = msm_jax.combine_window_totals_grouped(full, 2)
    print(f"host fold: {(time.time()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
