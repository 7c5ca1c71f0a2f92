"""Round-5 cold-compile experiments (run on the real chip).

The r04 driver bench spent 428.9 s of 444.4 s wall in XLA/Mosaic compiles
(~30 distinct stage programs x ~15 s each). Three hypotheses to measure:

A) Per-program compile cost vs width: is the Mosaic point-add kernel
   compile repeated inside every XLA program (same block shape, different
   grid), or cached across programs?
B) Do concurrent .lower().compile() calls overlap on this backend (i.e.
   can warmup precompile the ~30 programs on N threads)?
C) Does jax.experimental.serialize_executable round-trip work on this
   backend — serialize in one process, deserialize_and_load + run in a
   fresh one? (The persistent compile cache's READS hang here, r04; a
   bespoke load path may not.)

Usage:
  python benchmarks/exp_compile_r05.py probe      # legs A+B+C-serialize
  python benchmarks/exp_compile_r05.py load       # leg C-deserialize (fresh proc)
"""

import os
import pickle
import sys
import time

import numpy as np

# run as `python benchmarks/exp_compile_r05.py` from the repo root; a
# PYTHONPATH override breaks the sitecustomize accelerator-plugin hook
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/h2v_aot_test.pkl"


def _level_add_fn():
    import jax

    from halo2_verifier_tpu.ops import lmcurve as lc

    def level_add(f, iL, iR):
        a = tuple(c[:, iL] for c in f)
        b = tuple(c[:, iR] for c in f)
        return lc.OPS16.add(a, b)

    return jax.jit(level_add)


def _shapes(w_in, w_out):
    import jax

    from halo2_verifier_tpu.ops.limbs import NLIMBS

    f = tuple(
        jax.ShapeDtypeStruct((NLIMBS, w_in), np.uint32) for _ in range(3)
    )
    idx = jax.ShapeDtypeStruct((w_out,), np.int32)
    return f, idx, idx


def probe():
    import jax

    fn = _level_add_fn()
    t0 = time.time()
    d = jax.devices()[0]
    print(f"device: {d.platform} ({time.time() - t0:.1f}s to init)",
          flush=True)

    # A: serial compiles at descending widths (distinct XLA programs,
    # identical pallas block shape)
    for w_in, w_out in [(65536, 32768), (32768, 16384), (16384, 8192)]:
        t0 = time.time()
        fn.lower(*_shapes(w_in, w_out)).compile()
        print(f"A serial compile {w_in}->{w_out}: {time.time() - t0:.1f}s",
              flush=True)

    # B: concurrent compiles on 4 threads (fresh widths)
    from concurrent.futures import ThreadPoolExecutor

    widths = [(8192, 4096), (4096, 2048), (2048, 2048), (2048, 1024)]
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(lambda p: fn.lower(*_shapes(*p)).compile(), widths))
    print(f"B 4-thread compile of 4 programs: {time.time() - t0:.1f}s",
          flush=True)

    # C: serialize one compiled executable + run it here as sanity
    from jax.experimental.serialize_executable import serialize

    t0 = time.time()
    compiled = fn.lower(*_shapes(1024, 1024)).compile()
    print(f"C compile (1024->1024): {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    payload, in_tree, out_tree = serialize(compiled)
    with open(OUT, "wb") as fh:
        pickle.dump((payload, in_tree, out_tree), fh)
    print(f"C serialize: {time.time() - t0:.1f}s, "
          f"{len(payload) / 1e6:.2f} MB", flush=True)
    print("probe done", flush=True)


def load():
    import jax

    from jax.experimental.serialize_executable import deserialize_and_load

    t0 = time.time()
    d = jax.devices()[0]
    print(f"device: {d.platform} ({time.time() - t0:.1f}s to init)",
          flush=True)
    with open(OUT, "rb") as fh:
        payload, in_tree, out_tree = pickle.load(fh)
    t0 = time.time()
    compiled = deserialize_and_load(payload, in_tree, out_tree)
    print(f"C deserialize_and_load: {time.time() - t0:.1f}s", flush=True)

    from halo2_verifier_tpu.ops.limbs import NLIMBS

    f = tuple(
        jax.device_put(np.zeros((NLIMBS, 1024), np.uint32))
        for _ in range(3)
    )
    idx = jax.device_put(np.arange(1024, dtype=np.int32))
    t0 = time.time()
    out = compiled(f, idx, idx)
    jax.block_until_ready(out)
    print(f"C first run after load: {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    out = compiled(f, idx, idx)
    jax.block_until_ready(out)
    print(f"C second run: {time.time() - t0:.3f}s", flush=True)
    print("load done", flush=True)


if __name__ == "__main__":
    {"probe": probe, "load": load}[sys.argv[1]]()
