"""Profile the exact orchestrator MSM path for the bench workload:
host prep + dispatch / device compute / fetch + exact host fold."""
import time

import jax

from bench import build_fixture
from halo2_verifier_tpu.parallel.orchestrator import BatchVerifier
from halo2_verifier_tpu.ops.constants import R

t0 = time.time()
params, vk, proofs = build_fixture(64)
print("fixture", round(time.time() - t0, 3))

bv = BatchVerifier(params, vk)
t0 = time.time()
duals = bv.replay(proofs)
print("replay", round(time.time() - t0, 3))

weights = [bv._rng() for _ in duals]
left = []
right = []
t0 = time.time()
for dual, w in zip(duals, weights):
    for s, b in zip(dual.left.scalars, dual.left.bases):
        left.append((s * w % R, b))
    for s, b in zip(dual.right.scalars, dual.right.bases):
        right.append((s * w % R, b))
print("weight-mult", round(time.time() - t0, 3),
      "entries", len(left), len(right))


def run(tag):
    t0 = time.time()
    handle = bv._msm_dispatch_pair(left, right)
    t1 = time.time()
    jax.block_until_ready(handle[1])
    t2 = time.time()
    pts = bv._collect_pair(handle)
    t3 = time.time()
    print(f"{tag}: prep+dispatch={1e3 * (t1 - t0):.1f} "
          f"device_wait={1e3 * (t2 - t1):.1f} "
          f"fetch+fold={1e3 * (t3 - t2):.1f} "
          f"total={1e3 * (t3 - t0):.1f} ms")
    return pts


run("warmup (compiles)")
for i in range(3):
    run(f"steady{i}")
