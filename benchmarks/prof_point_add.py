"""Micro-profile of the fused point-add kernel: classic 3-convolution VPU
body vs the MXU constant-convolution body (H2V_MONT_MXU), on the real
chip. Reports ms per launch and point-adds/s at bench-like shapes, plus
the speed-of-light bound fraction.

    python benchmarks/prof_point_add.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def run(batch: int, iters: int, mxu: str):
    os.environ["H2V_MONT_MXU"] = mxu
    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from halo2_verifier_tpu.ops import hostcurve as hc
    from halo2_verifier_tpu.ops import lmcurve as lc
    from halo2_verifier_tpu.ops import lmfield as lf
    from halo2_verifier_tpu.ops.constants import G1_GEN, P
    from halo2_verifier_tpu.ops.field_jax import FQ
    from halo2_verifier_tpu.ops.limbs import ints_to_limbs

    npts = 128
    pts = [hc.g1_mul(G1_GEN, 3 + i) for i in range(npts)]
    mont = FQ.mont_r
    xs = np.asarray(ints_to_limbs(
        [pts[i % npts][0] * mont % P for i in range(batch)])).T
    ys = np.asarray(ints_to_limbs(
        [pts[i % npts][1] * mont % P for i in range(batch)])).T
    p = lc.OPS16.from_affine(jnp.asarray(xs), jnp.asarray(ys))
    q = lc.OPS16.from_affine(jnp.asarray(np.roll(xs, 1, axis=1)),
                             jnp.asarray(np.roll(ys, 1, axis=1)))
    p = tuple(np.asarray(c) for c in p)
    q = tuple(np.asarray(c) for c in q)

    @jax.jit
    def chain(p, q):
        # data-dependent chain so iters launches can't overlap-fuse
        r = lc.OPS16.add(p, q)
        r = lc.OPS16.add(r, q)
        return r

    t0 = time.time()
    out = chain(p, q)
    jax.block_until_ready(out)
    t_compile = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = chain(p, q)
    jax.block_until_ready(out)
    dt = time.time() - t0
    adds = 2 * iters * batch
    rate = adds / dt
    per_launch_ms = dt / iters * 1e3
    print(f"mxu={mxu}: compile {t_compile:.1f}s, {per_launch_ms:.2f} ms / "
          f"2-add chain @ batch {batch}, {rate/1e6:.2f}M point-adds/s")
    return rate


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    which = sys.argv[3] if len(sys.argv) > 3 else "both"
    rates = {}
    if which in ("both", "0"):
        rates["0"] = run(batch, iters, "0")
    if which in ("both", "1"):
        rates["1"] = run(batch, iters, "1")
    if len(rates) == 2:
        print(f"MXU speedup: {rates['1'] / rates['0']:.3f}x")


if __name__ == "__main__":
    main()
