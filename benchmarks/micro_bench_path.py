"""Profile the exact orchestrator MSM path for the bench workload."""
import time

import jax
import numpy as np

from bench import build_fixture
from halo2_verifier_tpu.parallel.orchestrator import (
    BatchVerifier, _entries_to_device,
)
from halo2_verifier_tpu.ops import msm_jax
from halo2_verifier_tpu.ops.constants import R

t0 = time.time()
params, vk, proofs = build_fixture(64)
print("fixture", time.time() - t0)

bv = BatchVerifier(params, vk)
t0 = time.time()
duals = bv.replay(proofs)
print("replay", time.time() - t0)

weights = [bv._rng() for _ in duals]
left = []
right = []
t0 = time.time()
for dual, w in zip(duals, weights):
    for s, b in zip(dual.left.scalars, dual.left.bases):
        left.append((s * w % R, b))
    for s, b in zip(dual.right.scalars, dual.right.bases):
        right.append((s * w % R, b))
print("weight-mult", time.time() - t0, "entries", len(left), len(right))

pad_to = 4096
for tag, entries in (("left", left), ("right", right)):
    e = entries + [(0, None)] * (pad_to - len(entries))
    from halo2_verifier_tpu.protocol.kzg import MSMKZG
    m = MSMKZG([s for s, _ in e], [b for _, b in e])
    t0 = time.time()
    s_arr, x_arr, y_arr = _entries_to_device(m)
    jax.block_until_ready([s_arr, x_arr, y_arr])
    print(tag, "entries_to_device", time.time() - t0)
    t0 = time.time()
    lv = msm_jax._scan_levels(np.asarray(s_arr))
    print(tag, "scan_levels", time.time() - t0, "levels =", lv)
    t0 = time.time()
    wt = msm_jax.msm_window_totals(s_arr, x_arr, y_arr)
    jax.block_until_ready(wt)
    print(tag, "window_totals (may compile)", time.time() - t0)
    t0 = time.time()
    wt = msm_jax.msm_window_totals(s_arr, x_arr, y_arr)
    jax.block_until_ready(wt)
    print(tag, "window_totals steady", time.time() - t0)
    t0 = time.time()
    pt = msm_jax.combine_window_totals(wt)
    print(tag, "host combine", time.time() - t0)
