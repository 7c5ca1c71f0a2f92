"""Batched Pippenger multi-scalar multiplication on TPU.

TPU-native restructuring of the reference's serial bucket loop
(arithmetic.rs:7-95):

1. All windows at once: every (point, window) pair becomes an entry keyed by
   window*2^c + digit; one sort + one log-depth segmented scan (complete
   point-add as the combine) yields every bucket sum of every window
   simultaneously. Point ops are limbs-major Pallas kernels (ops/lmcurve.py)
   — the whole RCB15 dataflow per add stays in VMEM.
2. Bucket reduction ("summation by parts", arithmetic.rs:86-94) is two
   suffix scans over the bucket axis, vectorized across windows.
3. Window combination — 248 sequential doublings on a single point — is
   latency-, not throughput-shaped, so it leaves the device: the 32
   projective window totals (6 KB) are fetched and combined with exact host
   arithmetic. This also removes the device-side Fermat inversion for the
   final affine conversion.

Sharding (SURVEY.md §2.3): entries split across a 1-D mesh; each chip
produces its window totals and only those 6 KB cross chips (parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import lmcurve as lc
from . import lmfield as lf
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


def _segmented_inclusive_scan(pts, keys, levels, ops=None):
    """Hillis-Steele inclusive segmented scan (point add as combine) along
    axis 1 of limbs-major coords. Dynamic roll offset keeps ONE add graph
    compiled for all levels.

    `levels` only needs to cover the longest segment whose sum is USED
    (non-zero-digit buckets) — the wrapper computes it from the actual keys
    on the host, which typically cuts 17 levels to ~6 for random scalars.
    Zero-digit segments (discarded later) may be left partially summed."""
    ops = ops or lc.OPS16
    m = keys.shape[0]
    idx = jnp.arange(m)

    def body(k, pts):
        offset = jnp.uint32(1) << k
        shifted = tuple(jnp.roll(c, offset, axis=1) for c in pts)
        same = (idx >= offset) & (keys == jnp.roll(keys, offset))
        return ops.masked_add(pts, shifted, same)

    return jax.lax.fori_loop(0, levels, body, pts)


def _suffix_scan_buckets(pts, ops=None):
    """Inclusive suffix sums along the bucket axis (axis 2) of
    (NLIMBS, W, B) coords."""
    ops = ops or lc.OPS16
    m = pts[0].shape[2]
    idx = jnp.arange(m)
    levels = max((m - 1).bit_length(), 1)

    def body(k, pts):
        offset = jnp.uint32(1) << k
        shifted = tuple(jnp.roll(c, -offset, axis=2) for c in pts)
        valid = jnp.broadcast_to(idx + offset < m, pts[0].shape[1:])
        return ops.masked_add(pts, shifted, valid)

    return jax.lax.fori_loop(0, levels, body, pts)


def window_totals_impl(scalars, points_x, points_y, levels=None):
    """Pippenger bucket accumulation + reduction; returns projective window
    totals as 3 limbs-major (NLIMBS, NUM_WINDOWS) arrays.

    scalars: (n, NLIMBS) uint32 canonical (NOT Montgomery) limbs.
    points_x/points_y: (n, NLIMBS) affine Montgomery coords, (0,0)=identity.
    levels: scan depth (see _segmented_inclusive_scan); defaults to the
    worst case log2(n * NUM_WINDOWS).
    """
    n = scalars.shape[0]
    if levels is None:
        levels = max((n * NUM_WINDOWS - 1).bit_length(), 1)
    digits = _digits(scalars)  # (n, W)

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
    pts = lc.from_affine(
        points_x[idx_sorted].T, points_y[idx_sorted].T
    )
    # zero digits contribute nothing: neutralize them
    zero_digit = (keys_sorted & (NUM_BUCKETS - 1)) == 0
    pts = lc.select_point(zero_digit, lc.identity(keys_sorted.shape[0]), pts)

    summed = _segmented_inclusive_scan(pts, keys_sorted, levels)

    # segment ends hold bucket totals; scatter them (unique indices)
    is_end = jnp.concatenate(
        [keys_sorted[1:] != keys_sorted[:-1], jnp.ones((1,), dtype=bool)]
    )
    scatter_idx = jnp.where(is_end, keys_sorted, NUM_WINDOWS * NUM_BUCKETS)
    nslots = NUM_WINDOWS * NUM_BUCKETS + 1
    buckets = tuple(
        jnp.zeros((NLIMBS, nslots), dtype=c.dtype)
        .at[:, scatter_idx].set(c)
        for c in summed
    )
    buckets = tuple(
        c[:, :-1].reshape(NLIMBS, NUM_WINDOWS, NUM_BUCKETS) for c in buckets
    )
    # unwritten buckets are all-zero, which is not the (0:1:0) identity
    # encoding; patch Y to Montgomery one
    empty = lf.is_zero(buckets[1]) & lf.is_zero(buckets[2])
    one = jnp.broadcast_to(
        lf.mont_one(FQ, 1)[:, :, None], buckets[1].shape
    )
    buckets = (
        buckets[0],
        jnp.where(empty[None], one, buckets[1]),
        buckets[2],
    )

    # summation by parts: suffix-scan buckets 1..B-1 gives running sums;
    # their total (window value sum_k k*B_k) is element 0 of a second scan
    tail = tuple(c[:, :, 1:] for c in buckets)
    suffix = _suffix_scan_buckets(tail)
    totals = _suffix_scan_buckets(suffix)
    return tuple(c[:, :, 0] for c in totals)  # (NLIMBS, W) each


_wt_jit = jax.jit(window_totals_impl, static_argnames=("levels",))


# ------------------------------------------------- grouped presorted MSM
#
# The batch orchestrator's fast path. Everything cheap and sequential
# (digit extraction, entry sort, scan-depth choice) happens on the HOST in
# numpy; the device does only the wide vector work (gather, segmented scan,
# bucket reduction). Several independent MSMs ("groups" — e.g. a DualMSM's
# left and right) share ONE device dispatch and ONE stacked output array,
# because on a tunneled TPU every host<->device round trip costs ~35 ms —
# more than the kernels themselves at batch sizes of a few thousand points.

def host_plan(scalars_np, groups):
    """Host Pippenger plan over concatenated group entries.

    scalars_np: (sum(sizes), NLIMBS) uint32 canonical scalar limbs — the
    groups' entries concatenated. `groups` is an int (equal-sized groups) or
    a list of per-group entry counts (groups may differ in size: a DualMSM's
    left accumulator is typically ~10x smaller than its right). Returns
    (idx_sorted int32, keys_sorted uint32, levels int): entry order sorted
    by global bucket key group*W*B + window*B + digit, and the scan depth
    covering the longest non-zero-digit bucket run.
    """
    total = scalars_np.shape[0]
    if isinstance(groups, int):
        assert total % groups == 0
        sizes = [total // groups] * groups
    else:
        sizes = list(groups)
        assert sum(sizes) == total
    per_limb = LIMB_BITS // WINDOW_BITS
    digit_cols = []
    for w in range(NUM_WINDOWS):
        limb = w // per_limb
        shift = WINDOW_BITS * (w % per_limb)
        digit_cols.append(
            (scalars_np[:, limb] >> shift) & np.uint32(NUM_BUCKETS - 1)
        )
    digits = np.stack(digit_cols, axis=1)  # (total, W)
    group_id = np.repeat(
        np.arange(len(sizes), dtype=np.uint32), sizes
    )[:, None]
    win = np.arange(NUM_WINDOWS, dtype=np.uint32)[None, :]
    keys = (
        group_id * np.uint32(NUM_WINDOWS * NUM_BUCKETS)
        + win * np.uint32(NUM_BUCKETS)
        + digits
    ).reshape(-1)
    point_idx = np.broadcast_to(
        np.arange(total, dtype=np.int32)[:, None], digits.shape
    ).reshape(-1)
    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]
    idx_sorted = point_idx[order]

    nz = keys_sorted[(keys_sorted & (NUM_BUCKETS - 1)) != 0]
    if nz.size:
        counts = np.bincount(nz)
        longest = max(int(counts.max()), 1)
    else:
        longest = 1
    levels = max(longest.bit_length() - (longest & (longest - 1) == 0), 1)
    levels = min(levels + (levels & 1), 32)  # round up to even
    return idx_sorted, keys_sorted, levels


def window_totals_presorted_impl(points_x, points_y, idx_sorted,
                                 keys_sorted, total_windows, levels,
                                 backend="u16"):
    """Device stage of the grouped MSM: gather points in host-sorted bucket
    order, segmented-scan bucket sums, reduce. Returns ONE stacked
    (3, nlimbs, total_windows) array (X, Y, Z window totals) so the caller
    fetches a single buffer.

    points_x/points_y are CANONICAL affine u32 16-bit limbs ((0,0) =
    identity); the Montgomery conversion happens here, after the gather, as
    two wide device multiplies — the host never touches per-point big ints.

    backend: "u16" (uint32 16-bit limbs) or "f8" (float32 8-bit limbs — see
    ops/lmfield8.py; ~an order of magnitude faster on VPUs that emulate
    32-bit integer multiply). Both compute identical window totals.

    total_windows = groups * NUM_WINDOWS; group g's windows occupy columns
    [g*NUM_WINDOWS, (g+1)*NUM_WINDOWS).
    """
    from . import lmfield8 as l8

    ops = lc.OPS8 if backend == "f8" else lc.OPS16
    lfm = ops.lfm
    m = idx_sorted.shape[0]
    gx_u = points_x[idx_sorted].T
    gy_u = points_y[idx_sorted].T
    if backend == "f8":
        gx_u = l8.expand16_to8(gx_u)
        gy_u = l8.expand16_to8(gy_u)
        r2 = jnp.broadcast_to(
            jnp.asarray(
                np.asarray(_spec_r2_f8(), dtype=np.float32
                           ).reshape(l8.NLIMBS8, 1)
            ),
            (l8.NLIMBS8, m),
        )
    else:
        r2 = jnp.broadcast_to(FQ.r2_limbs.reshape(NLIMBS, 1), (NLIMBS, m))
    # dispatching mont_mul: the fused Pallas kernel on TPU (the plain XLA
    # body materializes hundreds of intermediates and costs ~10x)
    gx = lfm.mont_mul(gx_u, r2, FQ)
    gy = lfm.mont_mul(gy_u, r2, FQ)
    pts = ops.from_affine(gx, gy)
    zero_digit = (keys_sorted & (NUM_BUCKETS - 1)) == 0
    pts = ops.select_point(zero_digit, ops.identity(m), pts)
    summed = _segmented_inclusive_scan(pts, keys_sorted, levels, ops)

    is_end = jnp.concatenate(
        [keys_sorted[1:] != keys_sorted[:-1], jnp.ones((1,), dtype=bool)]
    )
    nl = ops.nlimbs
    nslots = total_windows * NUM_BUCKETS + 1
    scatter_idx = jnp.where(is_end, keys_sorted,
                            total_windows * NUM_BUCKETS)
    buckets = tuple(
        jnp.zeros((nl, nslots), dtype=c.dtype)
        .at[:, scatter_idx].set(c)
        for c in summed
    )
    buckets = tuple(
        c[:, :-1].reshape(nl, total_windows, NUM_BUCKETS)
        for c in buckets
    )
    empty = lfm.is_zero(buckets[1]) & lfm.is_zero(buckets[2])
    one = jnp.broadcast_to(
        lfm.mont_one(FQ, 1)[:, :, None], buckets[1].shape
    )
    buckets = (
        buckets[0],
        jnp.where(empty[None], one, buckets[1]),
        buckets[2],
    )
    tail = tuple(c[:, :, 1:] for c in buckets)
    suffix = _suffix_scan_buckets(tail, ops)
    totals = _suffix_scan_buckets(suffix, ops)
    return jnp.stack([c[:, :, 0] for c in totals])  # (3, nl, TW)


def _spec_r2_f8():
    """FQ's R^2 constant in 8-bit limbs (module-level to stay hashable)."""
    v = FQ.mont_r2
    return [float((v >> (8 * i)) & 0xFF) for i in range(32)]


_wt_presorted_jit = jax.jit(
    window_totals_presorted_impl,
    static_argnames=("total_windows", "levels", "backend"),
)


def default_backend() -> str:
    """Limb backend for the grouped MSM. u16 by default: measured on the
    v5e-class chip, the f8 point-add (4x the vector ops on 2x the rows)
    runs 2.4x SLOWER than u16 despite f32 multiplies being individually
    cheaper than the emulated 32-bit integer multiply — the convolution's
    embed/add traffic dominates. f8 stays available (H2V_LIMB_BACKEND=f8,
    differential-tested) for hardware where the multiply gap is wider."""
    import os

    flag = os.environ.get("H2V_LIMB_BACKEND")
    if flag in ("u16", "f8"):
        return flag
    return "u16"

# per-(m, total_windows) high-water mark for the scan depth (see _LEVEL_HWM)
_PLAN_HWM: dict[tuple, int] = {}


def msm_window_totals_grouped(points_x_np, points_y_np, idx_sorted,
                              keys_sorted, groups: int, levels: int,
                              backend: str | None = None):
    """Dispatch the grouped MSM (groups = group COUNT); returns the
    (3, nlimbs, g*W) device array WITHOUT synchronizing. Inputs are host
    numpy (uploaded here, once)."""
    backend = backend or default_backend()
    key = (idx_sorted.shape[0], groups, backend)
    levels = max(levels, _PLAN_HWM.get(key, 0))
    _PLAN_HWM[key] = levels
    return _wt_presorted_jit(
        jnp.asarray(points_x_np), jnp.asarray(points_y_np),
        jnp.asarray(idx_sorted), jnp.asarray(keys_sorted),
        total_windows=groups * NUM_WINDOWS, levels=levels,
        backend=backend,
    )


def combine_window_totals_grouped(arr, groups: int):
    """HOST stage: ONE fetch of the stacked (3, NLIMBS, g*W) window totals,
    then per-group exact Horner fold. Returns a list of g affine points
    ((x, y) ints or None)."""
    arr_np = np.asarray(arr)  # the single device->host transfer
    out = []
    for gi in range(groups):
        sl = slice(gi * NUM_WINDOWS, (gi + 1) * NUM_WINDOWS)
        out.append(combine_window_totals(
            tuple(arr_np[c][:, sl] for c in range(3))
        ))
    return out


def _scan_levels(scalars_np) -> int:
    """Data-driven scan depth: ceil(log2(longest non-zero-digit bucket
    run)), bucketed to even values so random workloads reuse one compiled
    variant. Exact for ANY input — adversarial digit distributions simply
    get a deeper (up to worst-case) scan."""
    per_limb = LIMB_BITS // WINDOW_BITS
    counts = np.zeros(NUM_WINDOWS * NUM_BUCKETS, dtype=np.int64)
    for w in range(NUM_WINDOWS):
        limb = w // per_limb
        shift = WINDOW_BITS * (w % per_limb)
        d = ((scalars_np[:, limb] >> shift) & (NUM_BUCKETS - 1)).astype(
            np.int64
        )
        counts[w * NUM_BUCKETS:(w + 1) * NUM_BUCKETS] = np.bincount(
            d, minlength=NUM_BUCKETS
        )
        counts[w * NUM_BUCKETS] = 0  # zero-digit buckets are discarded
    longest = max(int(counts.max()), 1)
    levels = max(longest.bit_length() - (longest & (longest - 1) == 0), 1)
    return min(levels + (levels & 1), 32)  # round up to even


# per-pad-size high-water mark for the scan depth: running a deeper scan
# than needed is correct (extra masked levels), so reusing the deepest
# already-compiled variant avoids a ~20 s recompile when the data-driven
# depth wobbles (it depends on the batch's random isolation weights)
_LEVEL_HWM: dict[int, int] = {}


def msm_window_totals(scalars, points_x, points_y):
    """jitted window-totals MSM with shape bucketing: entry counts pad to
    the next power of two with zero scalars (which contribute nothing), so
    at most log2(n_max) kernel variants ever compile. Returns device arrays
    WITHOUT synchronizing — dispatch several MSMs, then combine."""
    levels = _scan_levels(np.asarray(scalars))
    n = scalars.shape[0]
    target = 1 << max((n - 1).bit_length(), 0)
    levels = max(levels, _LEVEL_HWM.get(target, 0))
    _LEVEL_HWM[target] = levels
    if target != n:
        pad = target - n
        padz = jnp.zeros((pad, scalars.shape[1]), dtype=scalars.dtype)
        scalars = jnp.concatenate([scalars, padz])
        points_x = jnp.concatenate([points_x, padz])
        points_y = jnp.concatenate([points_y, padz])
    return _wt_jit(scalars, points_x, points_y, levels=levels)


def combine_window_totals(wts):
    """HOST stage: fold window totals into the final affine point.

    wts: one (or a list, e.g. per mesh device, to be summed) of projective
    window-totals triples — each 3 x (NLIMBS, NUM_WINDOWS) arrays. The
    Horner ladder result = sum_w 2^(c*w) T_w runs in exact host arithmetic:
    248 sequential doublings are latency-bound on device but microseconds
    here. Synchronizes the device values. Returns (x, y) ints or None.
    """
    from . import hostcurve as hc

    if not isinstance(wts, list):
        wts = [wts]
    per_window = [None] * NUM_WINDOWS  # affine per window, summed over parts
    for wt in wts:
        aff = lc.to_affine_host(tuple(np.asarray(c) for c in wt))
        for w in range(NUM_WINDOWS):
            per_window[w] = hc.g1_add(per_window[w], aff[w])
    acc = hc.J_IDENTITY
    for w in reversed(range(NUM_WINDOWS)):
        if acc != hc.J_IDENTITY:
            for _ in range(WINDOW_BITS):
                acc = hc.j_double(acc)
        if per_window[w] is not None:
            acc = hc.j_add(acc, hc.j_from_affine(per_window[w]))
    if acc == hc.J_IDENTITY:
        return None
    return hc.batch_normalize([acc])[0]


def msm(scalars, points_x, points_y):
    """Full MSM: device bucket pipeline + host window combine; synchronizes
    and returns a host affine point (x, y) or None for identity."""
    return combine_window_totals(
        msm_window_totals(scalars, points_x, points_y)
    )


# ------------------------------------------------------------ host bridge

def msm_host(scalars_int, points_affine):
    """Convenience wrapper: python ints / host affine points in, host affine
    point out. The exactness oracle is ops.hostcurve.g1_msm."""
    from .constants import P, R
    from .limbs import ints_to_limbs

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
    from .field_jax import FR

    S = jnp.asarray(ints_to_limbs([s % FR.modulus for s in scalars_int]))
    X = jnp.asarray(ints_to_limbs(xs))
    Y = jnp.asarray(ints_to_limbs(ys))
    return msm(S, X, Y)
