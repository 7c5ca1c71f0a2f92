"""Scratch micro-benchmark for the limbs-major Pallas MSM path (TPU)."""
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from halo2_verifier_tpu.ops import hostcurve as hc
from halo2_verifier_tpu.ops import lmcurve as lc
from halo2_verifier_tpu.ops import lmfield as lf
from halo2_verifier_tpu.ops import msm_jax
from halo2_verifier_tpu.ops.constants import G1_GEN, P, R
from halo2_verifier_tpu.ops.field_jax import FQ
from halo2_verifier_tpu.ops.limbs import ints_to_limbs

print("backend:", jax.default_backend(), "use_pallas:", lf.use_pallas())
rng = random.Random(7)

# correctness: pallas mont_mul vs host ints at B=2048
n = 2048
a = [rng.randrange(P) for _ in range(n)]
b = [rng.randrange(P) for _ in range(n)]
A = jnp.asarray(ints_to_limbs(a)).T
B = jnp.asarray(ints_to_limbs(b)).T
t0 = time.time()
got = lf.mont_mul(A, B, FQ)
jax.block_until_ready(got)
print("pallas mont_mul compile+run", time.time() - t0)
from halo2_verifier_tpu.ops.limbs import limbs_to_ints
rinv = pow(FQ.mont_r, -1, P)
gv = limbs_to_ints(np.asarray(got).T)
ev = [x * y % P * rinv % P for x, y in zip(a, b)]
assert gv == ev, "PALLAS MONT_MUL MISMATCH"
print("pallas mont_mul CORRECT")

# perf: mont_mul steady at large B
Bn = 131072 * 6
X = jnp.asarray(np.random.randint(0, 1 << 16, size=(16, Bn), dtype=np.uint32))
Y = jnp.asarray(np.random.randint(0, 1 << 16, size=(16, Bn), dtype=np.uint32))
r = lf.mont_mul(X, Y, FQ); jax.block_until_ready(r)
t0 = time.time()
for _ in range(10):
    r = lf.mont_mul(X, Y, FQ)
jax.block_until_ready(r)
print(f"pallas mont_mul (16,{Bn}) x10 steady", time.time() - t0)

# perf: complete add at 131072
Bp = 131072
def rnd(): return jnp.asarray(np.random.randint(0, 1 << 16, size=(16, Bp), dtype=np.uint32))
p = (rnd(), rnd(), rnd()); q = (rnd(), rnd(), rnd())
t0 = time.time(); r = lc.add(p, q); jax.block_until_ready(r)
print("pallas point-add compile+run", time.time() - t0)
t0 = time.time()
for _ in range(10):
    r = lc.add(p, q)
jax.block_until_ready(r)
print(f"pallas point-add ({Bp}) x10 steady", time.time() - t0)

# full MSM correctness + perf at 4096 entries
n = 4096
scalars = [rng.randrange(R) for _ in range(n)]
points = [hc.g1_mul(G1_GEN, rng.randrange(1, 1 << 30)) for _ in range(n)]
S = jnp.asarray(ints_to_limbs(scalars))
Xp = jnp.asarray(ints_to_limbs([p[0] * FQ.mont_r % P for p in points]))
Yp = jnp.asarray(ints_to_limbs([p[1] * FQ.mont_r % P for p in points]))
t0 = time.time()
wt = msm_jax.msm_window_totals(S, Xp, Yp)
jax.block_until_ready(wt)
print("msm4096 window-totals compile+run", time.time() - t0)
t0 = time.time()
wt = msm_jax.msm_window_totals(S, Xp, Yp)
jax.block_until_ready(wt)
print("msm4096 window-totals steady", time.time() - t0)
t0 = time.time()
got = msm_jax.combine_window_totals(wt)
print("host combine", time.time() - t0)
t0 = time.time()
expected = hc.g1_msm(scalars, points)
print("host oracle msm", time.time() - t0)
assert got == expected, "MSM MISMATCH"
print("msm4096 CORRECT")
