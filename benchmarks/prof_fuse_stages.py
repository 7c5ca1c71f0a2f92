"""Per-stage device-time breakdown of the fuse3 forest path on the real
chip: head (convert+gather) / each levels3 triple / tail (bucket phase),
each synced with block_until_ready so the per-program device cost is
visible (each sync adds one tunnel RTT — read the numbers as program
cost + ~4-9 ms).

    python benchmarks/prof_fuse_stages.py [m_left m_right reps]

Motivation: the bench's device stage costs ~290-300 ms/batch while the
point-add arithmetic alone at measured kernel rates would be ~40 ms —
this locates the rest (conversion? gathers? bucket phase? index-array
uploads?) before any optimization is attempted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from halo2_verifier_tpu.ops import msm_forest  # noqa: E402
from halo2_verifier_tpu.ops.constants import R, G1_GEN  # noqa: E402
from halo2_verifier_tpu.ops import hostcurve as hc  # noqa: E402
from halo2_verifier_tpu.ops.limbs import ints_to_limbs  # noqa: E402


def main():
    m_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    m_right = int(sys.argv[2]) if len(sys.argv) > 2 else 14592
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    total = m_left + m_right
    rng = np.random.RandomState(7)

    npts = 256
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    xs_np = np.asarray(ints_to_limbs([pts[i % npts][0] for i in range(total)]))
    ys_np = np.asarray(ints_to_limbs([pts[i % npts][1] for i in range(total)]))
    sizes = [m_left, m_right]
    print(f"devices: {jax.devices()}  shapes: {sizes}")

    for rep in range(reps):
        ss = np.asarray(ints_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") % R
             for _ in range(total)]
        ))
        t0 = time.time()
        plan = msm_forest.host_plan(ss, sizes)
        t_plan = time.time() - t0

        levels = plan["levels"]
        parts = plan["finished"]
        L = len(levels)
        assert L % 3 == 0 and len(parts) == L + 1

        xs, ys = msm_forest._pad_transpose_points(
            xs_np, ys_np, plan["n_pad"])
        marks = []

        def sync(tag, val):
            t0 = time.time()
            jax.block_until_ready(val)
            marks.append((tag, time.time() - t0))
            return val

        t0 = time.time()
        xs_d, ys_d = jnp.asarray(xs), jnp.asarray(ys)
        idx0 = jnp.asarray(plan["point_idx0"])
        jax.block_until_ready((xs_d, ys_d, idx0))
        t_upload = time.time() - t0

        t0 = time.time()
        f = msm_forest._stage_head(xs_d, ys_d, idx0)
        marks.append(("head.enq", time.time() - t0))
        sync("head", f)

        out_parts = []
        for t in range(0, L, 3):
            t0 = time.time()
            trip = tuple((jnp.asarray(iL), jnp.asarray(iR))
                         for iL, iR in levels[t:t + 3])
            fins = tuple(jnp.asarray(parts[t + j][1]) for j in range(3))
            jax.block_until_ready((trip, fins))
            t_idx = time.time() - t0
            widths = [levels[t + j][0].shape[0] for j in range(3)]
            t0 = time.time()
            f, outs = msm_forest._stage_levels3(f, trip, fins)
            t_enq = time.time() - t0
            out_parts.extend(outs)
            sync(f"lvl3[{t//3}] w={widths} idx_up={t_idx*1e3:.1f}ms "
                 f"enq={t_enq*1e3:.1f}ms", f)

        t0 = time.time()
        pos_last = jnp.asarray(parts[L][1])
        scat = jnp.asarray(msm_forest._plan_scatter_idx(plan))
        jax.block_until_ready((pos_last, scat))
        t_scat = time.time() - t0
        t0 = time.time()
        arr = msm_forest._stage_tail(
            f, pos_last, tuple(out_parts), scat,
            tw=plan["tw"], bucket_scan=msm_forest._use_bucket_scan())
        t_enq = time.time() - t0
        sync(f"tail idx_up={t_scat*1e3:.1f}ms enq={t_enq*1e3:.1f}ms", arr)

        t0 = time.time()
        np.asarray(arr)
        t_fetch = time.time() - t0

        print(f"rep{rep}: plan={t_plan*1e3:.1f}ms "
              f"pts_upload={t_upload*1e3:.1f}ms fetch={t_fetch*1e3:.1f}ms")
        for tag, dt in marks:
            print(f"    {tag}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
