"""Scaling-efficiency sweep for the sharded forest MSM (BASELINE.md
metric 3: >=80% efficiency 1 -> 16 chips).

Times the production multi-chip MSM (parallel/mesh.py
sharded_forest_by_windows: chip d plans and runs an addition forest over
windows [d*W/D, (d+1)*W/D) of every group across all points — no
collective; only (3, NLIMBS, tw/D) window totals leave each chip) at a
fixed total workload while the device count doubles:
efficiency(D) = T(1) / (D * T(D)) (strong scaling).

On real multi-chip hardware this produces the reportable curve. On this
box (one tunneled chip) it runs on a virtual CPU mesh — methodology
identical, absolute numbers meaningless; pass --devices to size the mesh.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling_sweep.py --entries 1024
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # honor JAX_PLATFORMS=cpu even where a sitecustomize hook pins the
    # accelerator platform (must land before any jax device use)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=4352,
                    help="MSM points per batch (both groups combined)")
    ap.add_argument("--devices", type=int, default=0,
                    help="max devices (0 = all available)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    from halo2_verifier_tpu.ops import hostcurve as hc
    from halo2_verifier_tpu.ops.constants import G1_GEN, R
    from halo2_verifier_tpu.ops.limbs import ints_to_limbs
    from halo2_verifier_tpu.parallel import mesh as pmesh

    ndev_max = args.devices or len(jax.devices())
    total = args.entries
    rng = np.random.RandomState(5)
    npts = 256
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    xs = np.asarray(ints_to_limbs([pts[i % npts][0] for i in range(total)]))
    ys = np.asarray(ints_to_limbs([pts[i % npts][1] for i in range(total)]))
    ss = np.asarray(ints_to_limbs(
        [int.from_bytes(rng.bytes(32), "little") % R for _ in range(total)]
    ))
    half = total // 2
    sizes = [half, total - half]

    results = {}
    wire = {}
    fixed_ms = {}
    d = 1
    while d <= ndev_max:
        mesh = pmesh.make_mesh(d)
        # compile + warm (per-chip plans + the SPMD forest program)
        arr = pmesh.sharded_forest_by_windows(mesh, xs, ys, ss, sizes)
        arr.block_until_ready()
        t0 = time.time()
        t_host = 0.0
        for _ in range(args.reps):
            stats = {}
            te = time.time()
            arr = pmesh.sharded_forest_by_windows(mesh, xs, ys, ss, sizes,
                                                  stats=stats)
            t_host += time.time() - te  # plan + upload + enqueue (serial)
            arr.block_until_ready()
        dt = (time.time() - t0) / args.reps
        results[d] = dt
        wire[d] = stats
        # the D-independent per-batch cost: host planning/upload/enqueue —
        # the asymptote that bounds strong scaling (VERDICT r03 item 8)
        fixed_ms[d] = round(1e3 * t_host / args.reps, 2)
        print(f"D={d}: {dt*1e3:.1f} ms/batch (host fixed "
              f"{fixed_ms[d]:.1f} ms; collective "
              f"{stats['collective_bytes_per_chip']} B/chip; fetch "
              f"{stats['fetch_bytes_per_chip']} B/chip)", flush=True)
        d *= 2

    t1 = results[1]
    out = {
        "entries": total,
        "times_ms": {str(d): round(t * 1e3, 2) for d, t in results.items()},
        "efficiency": {
            str(d): round(t1 / (d * t), 4) for d, t in results.items()
        },
        "per_chip_fixed_ms": {str(d): v for d, v in fixed_ms.items()},
        "wire": {str(d): v for d, v in wire.items()},
        "collective_bytes_per_msm": wire[max(wire)][
            "collective_bytes_per_chip"] * max(wire),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
