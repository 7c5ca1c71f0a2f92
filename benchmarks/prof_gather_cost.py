"""Isolate where forest device time goes: random lane gathers vs the
Pallas point-add kernel vs strided slicing.

At bench shapes the forest spends ~130 ms/batch on device for 155k adds
whose arithmetic bound is ~2 ms — something non-arithmetic dominates.
Suspects: axis-1 (lane) gathers of (16, W) u32 arrays. This times each
primitive at the real widths:

    python benchmarks/prof_gather_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from halo2_verifier_tpu.ops import msm_forest as mf  # noqa: E402
from halo2_verifier_tpu.ops import lmcurve as lc  # noqa: E402
from halo2_verifier_tpu.ops.limbs import NLIMBS  # noqa: E402


def timeit(fn, *args, reps=10, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda c: c.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda c: c.block_until_ready(), out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{label}: {dt:.2f} ms")
    return out


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)

    def mkpt(w):
        return tuple(
            jnp.asarray(rng.randint(0, 1 << 16, (NLIMBS, w), dtype=np.int64)
                        .astype(np.uint32))
            for _ in range(3)
        )

    # initial gather: 139264 out of a 5120-slot table
    src = mkpt(5120)
    idx0 = jnp.asarray(rng.randint(0, 5120, 139264).astype(np.int32))
    timeit(mf._gather0, src, idx0, label="gather0 5120->139264 (x3 coords)")

    # level 0: gathers at 73728 out of 139264 + add
    f0 = mkpt(139264)
    iL = jnp.asarray(rng.randint(0, 139264, 73728).astype(np.int32))
    iR = jnp.asarray(rng.randint(0, 139264, 73728).astype(np.int32))
    timeit(mf._level_add, f0, iL, iR, label="level_add 139264->73728")
    timeit(mf._gather0, f0, iL, label="gather0 139264->73728 (x3)")

    # the add alone on contiguous halves (strided slices, no index array)
    @jax.jit
    def strided_add(f):
        a = tuple(c[:, 0::2] for c in f)
        b = tuple(c[:, 1::2] for c in f)
        return lc.OPS16.add(a, b)

    f1 = mkpt(147456)
    timeit(strided_add, f1, label="strided fold 147456->73728 (no gather)")

    # contiguous-input add at the same width
    a = mkpt(73728)
    b = mkpt(73728)
    timeit(lambda a, b: lc.OPS16.add(a, b), a, b,
           label="pallas add 73728 contiguous")

    # upload/fetch bandwidth probe over the tunnel
    big = np.zeros((NLIMBS, 139264), dtype=np.uint32)  # 8.9 MB
    t0 = time.time()
    for _ in range(5):
        jnp.asarray(big).block_until_ready()
    print(f"upload 8.9MB: {(time.time()-t0)/5*1e3:.1f} ms")
    d = jnp.asarray(big)
    t0 = time.time()
    for _ in range(5):
        np.asarray(d)
    print(f"fetch 8.9MB: {(time.time()-t0)/5*1e3:.1f} ms")
    small = np.zeros((3, NLIMBS, 64), dtype=np.uint32)
    ds = jnp.asarray(small)
    ds.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        np.asarray(ds)
    print(f"fetch 12KB: {(time.time()-t0)/5*1e3:.1f} ms")


if __name__ == "__main__":
    main()
