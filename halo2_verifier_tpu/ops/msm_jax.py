"""Batched Pippenger multi-scalar multiplication on TPU.

TPU-native design (replacing the reference's serial bucket loop,
arithmetic.rs:7-95, with an execution shape the hardware likes):

1. All windows are processed at once: every (point, window) pair becomes one
   entry keyed by window*2^c + digit. One sort + one segmented
   associative-scan computes every bucket sum of every window — log-depth,
   fully vectorized point additions via the complete formulas.
2. Bucket reduction ("summation by parts", cf. arithmetic.rs:86-94) is a
   suffix scan over the bucket axis, vectorized across windows, followed by
   a log-depth tree reduction.
3. Window combination is a short Horner loop (c doublings + 1 add per
   window) under lax.fori_loop.

Everything is branchless; identities flow through the complete formulas.
Sharding: points are split across devices, each computes a partial MSM over
its slice, and the projective partials are combined with a log-depth
all-reduce (see parallel/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import curve_jax as cj
from . import field_jax as fj
from .field_jax import FQ
from .limbs import LIMB_BITS, NLIMBS

WINDOW_BITS = 8
NUM_WINDOWS = 256 // WINDOW_BITS  # scalars are < 2^254
NUM_BUCKETS = 1 << WINDOW_BITS


def _digits(scalars):
    """(n, NLIMBS) canonical scalar limbs -> (n, NUM_WINDOWS) uint32 digits;
    window w covers bits [w*c, (w+1)*c)."""
    per_limb = LIMB_BITS // WINDOW_BITS
    parts = []
    for w in range(NUM_WINDOWS):
        limb = w // per_limb
        shift = WINDOW_BITS * (w % per_limb)
        parts.append((scalars[:, limb] >> shift) & (NUM_BUCKETS - 1))
    return jnp.stack(parts, axis=1)


def _segmented_inclusive_scan(pts, keys):
    """Hillis-Steele inclusive segmented scan with point addition: after the
    scan, each position holds the sum of its segment's prefix.

    The log2(m) levels run under lax.fori_loop with a *dynamic* roll offset,
    so the complete-add graph is compiled ONCE for the whole scan — graph
    size is what dominates XLA compile time for these kernels."""
    m = keys.shape[0]
    idx = jnp.arange(m)
    levels = max((m - 1).bit_length(), 1)

    def body(k, pts):
        offset = jnp.uint32(1) << k
        shifted = tuple(jnp.roll(c, offset, axis=0) for c in pts)
        same = (idx >= offset) & (keys == jnp.roll(keys, offset))
        return cj.select_point(same, cj.add(pts, shifted), pts)

    return jax.lax.fori_loop(0, levels, body, pts)


def _suffix_scan_axis1(pts):
    """Inclusive suffix sums along axis 1 (plain, unsegmented); same
    one-graph fori_loop structure as the segmented scan."""
    m = pts[0].shape[1]
    idx = jnp.arange(m)
    levels = max((m - 1).bit_length(), 1)

    def body(k, pts):
        offset = jnp.uint32(1) << k
        shifted = tuple(jnp.roll(c, -offset, axis=1) for c in pts)
        valid = jnp.broadcast_to(idx + offset < m, pts[0].shape[:2])
        return cj.select_point(valid, cj.add(pts, shifted), pts)

    return jax.lax.fori_loop(0, levels, body, pts)


def msm_impl(scalars, points_x, points_y):
    """Pippenger MSM core.

    scalars: (n, NLIMBS) uint32 canonical (NOT Montgomery) limbs.
    points_x/points_y: (n, NLIMBS) uint32 affine Montgomery coordinates,
    (0,0) = identity. Returns a projective point (3 limb vectors).
    """
    n = scalars.shape[0]
    digits = _digits(scalars)  # (n, W)

    # flatten (point, window) pairs, keyed by window*B + digit
    keys = (
        digits
        + (jnp.arange(NUM_WINDOWS, dtype=jnp.uint32) * NUM_BUCKETS)[None, :]
    ).reshape(-1)
    point_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, NUM_WINDOWS)
    ).reshape(-1)

    order = jnp.argsort(keys)
    keys_sorted = keys[order]
    idx_sorted = point_idx[order]
    pts = cj.from_affine(points_x[idx_sorted], points_y[idx_sorted])
    # zero digits contribute nothing: neutralize them
    zero_digit = (keys_sorted & (NUM_BUCKETS - 1)) == 0
    pts = cj.select_point(zero_digit, cj.identity((keys_sorted.shape[0],)), pts)

    summed = _segmented_inclusive_scan(pts, keys_sorted)

    # segment ends hold bucket totals; scatter them (unique indices)
    is_end = jnp.concatenate(
        [keys_sorted[1:] != keys_sorted[:-1], jnp.ones((1,), dtype=bool)]
    )
    scatter_idx = jnp.where(is_end, keys_sorted, NUM_WINDOWS * NUM_BUCKETS)
    nslots = NUM_WINDOWS * NUM_BUCKETS + 1
    buckets = tuple(
        jnp.zeros((nslots,) + c.shape[1:], dtype=c.dtype)
        .at[scatter_idx].set(c)
        for c in summed
    )
    buckets = tuple(
        c[:-1].reshape((NUM_WINDOWS, NUM_BUCKETS) + c.shape[1:])
        for c in buckets
    )
    # unwritten buckets are all-zero, which is not the (0:1:0) identity
    # encoding; patch Y
    empty = fj.is_zero(buckets[1]) & fj.is_zero(buckets[2])
    buckets = (
        buckets[0],
        fj.select(empty, fj.mont_one(FQ, empty.shape), buckets[1]),
        buckets[2],
    )

    # summation by parts: suffix-scan buckets 1..B-1 gives running sums;
    # their total (window value sum_k k*B_k) is the 0th element of a second
    # suffix scan — reusing the same one-graph scan instead of a tree
    tail = tuple(c[:, 1:] for c in buckets)
    suffix = _suffix_scan_axis1(tail)
    totals = _suffix_scan_axis1(suffix)
    window_totals = tuple(c[:, 0] for c in totals)  # (W, ...)

    # Horner combine from the top window down, one doubling per iteration
    # with a masked add every WINDOW_BITS steps (single double+add graph)
    acc = tuple(jnp.take(c, NUM_WINDOWS - 1, axis=0) for c in window_totals)

    def body(i, acc):
        acc = cj.double(acc)
        w = NUM_WINDOWS - 2 - (i // WINDOW_BITS)
        tw = tuple(jnp.take(c, w, axis=0) for c in window_totals)
        do_add = ((i + 1) % WINDOW_BITS) == 0
        added = cj.add(acc, tw)
        return cj.select_point(
            jnp.broadcast_to(do_add, acc[0].shape[:-1]), added, acc
        )

    return jax.lax.fori_loop(0, (NUM_WINDOWS - 1) * WINDOW_BITS, body, acc)


_msm_jit = jax.jit(msm_impl)


def msm(scalars, points_x, points_y):
    """jitted MSM with shape bucketing: entry counts are padded to the next
    power of two with zero scalars (which contribute nothing), so at most
    log2(n_max) kernel variants ever compile."""
    n = scalars.shape[0]
    target = 1 << max((n - 1).bit_length(), 0)
    if target != n:
        pad = target - n
        padz = jnp.zeros((pad, scalars.shape[1]), dtype=scalars.dtype)
        scalars = jnp.concatenate([scalars, padz])
        points_x = jnp.concatenate([points_x, padz])
        points_y = jnp.concatenate([points_y, padz])
    return _msm_jit(scalars, points_x, points_y)


# ------------------------------------------------------------ host bridge

def msm_host(scalars_int, points_affine):
    """Convenience wrapper: python ints / host affine points in, host affine
    point out. The exactness oracle is ops.hostcurve.g1_msm."""
    import numpy as np

    from .constants import P
    from .limbs import ints_to_limbs, limbs_to_ints

    n = len(scalars_int)
    assert n == len(points_affine)
    if n == 0:
        return None
    xs, ys = [], []
    for pt in points_affine:
        if pt is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(pt[0] * FQ.mont_r % P)
            ys.append(pt[1] * FQ.mont_r % P)
    S = jnp.asarray(ints_to_limbs([s % fj.FR.modulus for s in scalars_int]))
    X = jnp.asarray(ints_to_limbs(xs))
    Y = jnp.asarray(ints_to_limbs(ys))
    res = msm(S, X, Y)
    x, y = cj.to_affine_batch(tuple(c[None] for c in res))
    xv = limbs_to_ints(np.asarray(fj.from_mont(x, FQ)))[0]
    yv = limbs_to_ints(np.asarray(fj.from_mont(y, FQ)))[0]
    if xv == 0 and yv == 0:
        return None
    return (xv, yv)
