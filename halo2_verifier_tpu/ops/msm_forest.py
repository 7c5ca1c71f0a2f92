"""Host-planned addition-forest Pippenger MSM — the grouped batch MSM's
fast path.

The segmented-scan formulation (ops/msm_jax.py) performs ~levels x M point
adds for M sorted (point, window) entries: every Hillis-Steele step adds
ALL M positions even though only the segment-interior ones combine. Since
the HOST already knows every entry's bucket key (the scalars arrive with
the proof bytes, never from device results), it can plan the entire
reduction as an explicit ADDITION FOREST instead:

  level l: frontier_{l+1}[i] = frontier_l[iL[i]] + frontier_l[iR[i]]

with per-level gather-index arrays built in numpy. Pairing entries within
each equal-key run halves every run per level, so the frontier width
shrinks geometrically and the total device work is ~M point adds — levels x
fewer than the scan — all of them UNMASKED fused Pallas adds on
lane-contiguous arrays. Identity-slot padding (the complete RCB15 add
absorbs identities) quantizes widths into a few compiled shape classes.

The bucket reduction replaces the two suffix scans (summation by parts,
arithmetic.rs:86-94) with a bit decomposition: for window total
sum_k k*B_k, split k into bits — sum_k k*B_k = sum_b 2^b * S_b where
S_b = sum of buckets whose digit has bit b set. Each S_b is a 7-level
binary-tree reduction over a statically-gathered 128-bucket plane, and the
2^b weighting is a 7-step double-and-add Horner over 8 lanes per window —
~W*8*127 adds instead of ~W*2*256*log(256).

Output format matches msm_jax.msm_window_totals_grouped: one stacked
(3, NLIMBS, groups*NUM_WINDOWS) Montgomery projective window-totals array,
combined on host by msm_jax.combine_window_totals_grouped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import lmcurve as lc
from . import lmfield as lf
from ..utils.aotcache import aot_jit
from .field_jax import FQ
from .limbs import LIMB_BITS, NLIMBS
from .msm_jax import NUM_BUCKETS, NUM_WINDOWS, WINDOW_BITS

def _quant(n: int, q: int) -> int:
    return -(-n // q) * q


def host_plan(scalars_np, groups, quant: int | None = None,
              window_lo: int = 0, window_count: int | None = None):
    """Plan the whole forest: native C++ planner when available (counting
    sort + analytic level construction, ~13x the numpy path — it sits on
    the main-thread critical path between VM replay and device dispatch),
    numpy otherwise. Both produce bitwise-identical plans
    (tests/test_msm_forest.py::test_native_plan_parity).

    window_lo/window_count select a window subset per group — the
    window-sharded multi-chip path plans chip d over windows
    [d*W/D, (d+1)*W/D) of every group (keys local to the subset)."""
    plan = _host_plan_native(scalars_np, groups, quant, window_lo,
                             window_count)
    if plan is None:
        plan = host_plan_np(scalars_np, groups, quant, window_lo,
                            window_count)
    return _canonicalize_plan(plan)


def _canonicalize_plan(plan):
    """Pin the plan's SHAPE SIGNATURE across batches of one workload.

    The level count and the set of levels carrying finished parts wobble
    with the batch's random isolation weights (e.g. 8 vs 9 levels, a
    level-0 part present or not) — each flip retraces/recompiles a stage
    program MID-STREAM (~2.8 s stalls observed on the v5e bench runs).
    Canonical form: level count padded to a multiple of 3 with identity
    no-op levels (id-slot gathers — the trailing frontier pad slots are
    identities by induction), and a (dump-keyed, identity-gathering)
    finished part at EVERY level. Device cost of the padding is a few
    thousand absorbed identity adds; the payoff is one compiled program
    per workload instead of one per plan shape."""
    levels = list(plan["levels"])
    widths = [plan["point_idx0"].shape[0]] + [l[0].shape[0] for l in levels]
    target = -(-max(len(levels), 1) // 3) * 3
    pad_adds = 0
    for _ in range(len(levels), target):
        prev_w = widths[-1]
        # dummy width = input width: matches what a REAL extra level would
        # quantize to at these shapes, so 8- and 9-level plans land on the
        # same signature instead of a floor-width odd one out
        iL = np.full(prev_w, prev_w - 1, dtype=np.int32)
        levels.append((iL, iL.copy()))
        widths.append(prev_w)
        pad_adds += prev_w
    fin_quant = min(
        (pos.shape[0] for _lvl, pos, _k in plan["finished"]), default=2048
    )
    dump = plan["tw"] * NUM_BUCKETS
    finished = list(plan["finished"])
    have = {lvl for lvl, _pos, _k in finished}
    for lvl in range(len(levels) + 1):
        if lvl not in have:
            finished.append((
                lvl,
                np.full(fin_quant, widths[lvl] - 1, dtype=np.int32),
                np.full(fin_quant, dump, dtype=np.int32),
            ))
    finished.sort(key=lambda t: t[0])
    plan["levels"] = levels
    plan["finished"] = finished
    plan["adds"] = plan["adds"] + pad_adds
    return plan


def _host_plan_native(scalars_np, groups, quant=None, window_lo=0,
                      window_count=None):
    from .. import native

    lib = native.load()
    if lib is None or not hasattr(lib, "h2v_forest_plan"):
        return None
    import ctypes

    total = scalars_np.shape[0]
    if window_count is None:
        window_count = NUM_WINDOWS
    if quant is None:
        quant = 4096 if total * window_count >= 65536 else 256
    fin_quant = min(quant, 2048)
    floor = min(quant, 2048)
    sizes = ([total // groups] * groups if isinstance(groups, int)
             else list(groups))
    n_groups = len(sizes)
    sc = np.ascontiguousarray(scalars_np, dtype=np.uint32)
    sz = np.asarray(sizes, dtype=np.uint64)
    max_entries = total * window_count
    max_levels = 40
    point_idx0 = np.empty(max_entries + quant + 1, dtype=np.int32)
    levels_cap = 2 * (max_entries + max_levels * (quant + floor) + 2)
    levels_buf = np.empty(levels_cap, dtype=np.int32)
    level_widths = np.empty(max_levels, dtype=np.uint64)
    fin_cap = max_entries + (max_levels + 2) * fin_quant
    fin_pos = np.empty(fin_cap, dtype=np.int32)
    fin_keys = np.empty(fin_cap, dtype=np.int32)
    fin_meta = np.empty(2 * (max_levels + 2), dtype=np.uint64)
    header = np.empty(6, dtype=np.uint64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.h2v_forest_plan(
        p(sc, ctypes.c_uint32), total, p(sz, ctypes.c_uint64), n_groups,
        quant, fin_quant, floor, window_lo, window_count,
        p(point_idx0, ctypes.c_int32), point_idx0.shape[0],
        p(levels_buf, ctypes.c_int32), levels_cap,
        p(level_widths, ctypes.c_uint64), max_levels,
        p(fin_pos, ctypes.c_int32), p(fin_keys, ctypes.c_int32), fin_cap,
        p(fin_meta, ctypes.c_uint64), max_levels + 2,
        p(header, ctypes.c_uint64),
    )
    if rc != 0:
        return None
    w_pad, n_levels, n_parts, entries, adds, n_pad = (int(v)
                                                      for v in header)
    levels = []
    off = 0
    for li in range(n_levels):
        w = int(level_widths[li])
        levels.append((levels_buf[off:off + w],
                       levels_buf[off + w:off + 2 * w]))
        off += 2 * w
    parts = []
    off = 0
    for pi in range(n_parts):
        lvl = int(fin_meta[2 * pi])
        w = int(fin_meta[2 * pi + 1])
        parts.append((lvl, fin_pos[off:off + w], fin_keys[off:off + w]))
        off += w
    return {
        "point_idx0": point_idx0[:w_pad],
        "levels": levels,
        "finished": parts,
        "tw": n_groups * window_count,
        "window_lo": window_lo,
        "n_pad": n_pad,
        "entries": entries,
        "adds": adds,
    }


def host_plan_np(scalars_np, groups, quant: int | None = None,
                 window_lo: int = 0, window_count: int | None = None):
    """Plan the whole forest on host numpy (reference implementation).

    scalars_np: (total, NLIMBS) uint32 canonical scalar limbs, groups
    concatenated; `groups` is an int (equal sizes) or per-group sizes.
    Returns a dict consumed by dispatch_planned. Zero digits are dropped
    here (they contribute nothing), so the device never sees them.
    window_lo/window_count select a per-group window subset (the
    window-sharded multi-chip path); keys are local to the subset.
    """
    total = scalars_np.shape[0]
    if window_count is None:
        window_count = NUM_WINDOWS
    if quant is None:
        # small problems quantize finer so level shapes stay tiny; large
        # ones coarser so shape classes (= compile variants) stay few.
        # 4096 keeps batch-to-batch width jitter (~sqrt(entries) per
        # level) inside one class while wasting <6% at bench shapes
        quant = 4096 if total * window_count >= 65536 else 256
    if isinstance(groups, int):
        assert total % groups == 0
        sizes = [total // groups] * groups
    else:
        sizes = list(groups)
        assert sum(sizes) == total
    per_limb = LIMB_BITS // WINDOW_BITS
    digit_cols = []
    for w in range(window_lo, window_lo + window_count):
        limb = w // per_limb
        shift = WINDOW_BITS * (w % per_limb)
        digit_cols.append(
            (scalars_np[:, limb] >> shift) & np.uint32(NUM_BUCKETS - 1)
        )
    digits = np.stack(digit_cols, axis=1)  # (total, window_count)
    group_id = np.repeat(
        np.arange(len(sizes), dtype=np.uint32), sizes
    )[:, None]
    win = np.arange(window_count, dtype=np.uint32)[None, :]
    keys = (
        group_id * np.uint32(window_count * NUM_BUCKETS)
        + win * np.uint32(NUM_BUCKETS)
        + digits
    ).reshape(-1)
    point_idx = np.broadcast_to(
        np.arange(total, dtype=np.int32)[:, None], digits.shape
    ).reshape(-1)
    nz = (keys & np.uint32(NUM_BUCKETS - 1)) != 0
    keys = keys[nz]
    point_idx = point_idx[nz]
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    idx0 = point_idx[order]

    # identity lane: unique points pad to a 1024 multiple with >= 1 zero
    # lane; canonical (0,0) converts/maps to the projective identity
    n_pad = _quant(total + 1, 1024)
    id_idx = n_pad - 1

    w_real = idx0.shape[0]
    w_pad = _quant(w_real + 1, quant)
    point_idx0 = np.full(w_pad, id_idx, dtype=np.int32)
    point_idx0[:w_real] = idx0

    # Each level: (a) buckets already reduced to ONE entry leave the
    # frontier — they are finalized by a gather from THIS level's frontier
    # at scatter time, so they stop costing pass-through adds (without
    # removal, ~tw*NUM_BUCKETS singletons ride every remaining level:
    # ~45% of all adds at bench shapes); (b) remaining equal-key runs
    # pair up and halve. Total device adds = entries - buckets + padding.
    levels = []      # per level: (iL, iR) gather pairs into next frontier
    finished = []    # per level: (pos_in_frontier, keys) finalized there
    cur_keys = keys
    prev_pad = w_pad
    while cur_keys.shape[0]:
        wl = cur_keys.shape[0]
        starts = np.empty(wl, dtype=bool)
        starts[0] = True
        np.not_equal(cur_keys[1:], cur_keys[:-1], out=starts[1:])
        seg_start_pos = np.flatnonzero(starts)
        seg_len = np.diff(np.append(seg_start_pos, wl))
        seg_id = np.cumsum(starts) - 1
        single = seg_len[seg_id] == 1
        fin_pos = np.flatnonzero(single)
        id_slot = prev_pad - 1  # inductively identity (pads add identities)
        if fin_pos.shape[0]:
            finished.append((len(levels), fin_pos.astype(np.int32),
                             cur_keys[fin_pos].astype(np.int32), id_slot))
        act_pos = np.flatnonzero(~single)
        if not act_pos.shape[0]:
            break
        act_keys = cur_keys[act_pos]
        wa = act_keys.shape[0]
        starts2 = np.empty(wa, dtype=bool)
        starts2[0] = True
        np.not_equal(act_keys[1:], act_keys[:-1], out=starts2[1:])
        seg_start2 = np.flatnonzero(starts2)
        seg_id2 = np.cumsum(starts2) - 1
        rank2 = np.arange(wa) - seg_start2[seg_id2]
        even = (rank2 & 1) == 0
        has_partner = np.zeros(wa, dtype=bool)
        has_partner[:-1] = even[:-1] & (act_keys[1:] == act_keys[:-1])
        out_pos = np.flatnonzero(even)
        # width floor: deep (narrow) levels share one compiled add variant
        # instead of one per shrinking width — identity-pad compute there
        # is cheap, Mosaic kernel compiles are ~20 s each
        floor = min(quant, 2048)
        out_pad = max(_quant(out_pos.shape[0] + 1, quant), floor)
        iL = np.full(out_pad, id_slot, dtype=np.int32)
        iR = np.full(out_pad, id_slot, dtype=np.int32)
        iL[:out_pos.shape[0]] = act_pos[out_pos]
        partner = np.minimum(out_pos + 1, wa - 1)  # clipped; gated below
        iR[:out_pos.shape[0]] = np.where(
            has_partner[out_pos], act_pos[partner], id_slot
        )
        levels.append((iL, iR))
        cur_keys = act_keys[even]
        prev_pad = out_pad

    tw = len(sizes) * window_count
    dump = tw * NUM_BUCKETS
    # pad each level's finished slice (identity-slot positions scatter to
    # the dump bucket) so part widths fall into few compiled shape classes
    fin_quant = min(quant, 2048)
    parts = []
    for lvl, pos, kk, id_slot in finished:
        m = pos.shape[0]
        pad = _quant(max(m, 1), fin_quant)
        pos_p = np.full(pad, id_slot, dtype=np.int32)
        keys_p = np.full(pad, dump, dtype=np.int32)
        pos_p[:m] = pos
        keys_p[:m] = kk
        parts.append((lvl, pos_p, keys_p))
    if not parts:  # all digits zero: scatter only identity padding
        parts.append((0, np.full(fin_quant, w_pad - 1, dtype=np.int32),
                      np.full(fin_quant, dump, dtype=np.int32)))
    return {
        "point_idx0": point_idx0,
        "levels": levels,
        "finished": parts,
        "tw": tw,
        "window_lo": window_lo,
        "n_pad": n_pad,
        "entries": w_real,
        "adds": sum(l[0].shape[0] for l in levels),
    }


@aot_jit
def _convert_points(xs, ys):
    """(NLIMBS, n_pad) canonical affine limbs -> projective Montgomery
    frontier source; (0,0) lanes (incl. the identity pad) -> identity."""
    b = xs.shape[1]
    r2 = jnp.broadcast_to(FQ.r2_limbs.reshape(NLIMBS, 1), (NLIMBS, b))
    gx = lf.mont_mul(xs, r2, FQ)
    gy = lf.mont_mul(ys, r2, FQ)
    return lc.from_affine(gx, gy)


@aot_jit
def _gather0(src, idx0):
    return tuple(c[:, idx0] for c in src)


@aot_jit
def _level_add(f, iL, iR):
    a = tuple(c[:, iL] for c in f)
    b = tuple(c[:, iR] for c in f)
    return lc.OPS16.add(a, b)


_LEAF_IDX_CACHE = {}


def _bucket_leaf_idx(tw: int):
    """Static gather indices for the bit-plane reduction: for each window
    w and digit bit b, the 128 buckets whose digit has bit b set, laid out
    (w, b)-major. Depends only on tw — computed once, reused forever."""
    idx = _LEAF_IDX_CACHE.get(tw)
    if idx is None:
        per_bit = [
            [k for k in range(1, NUM_BUCKETS) if (k >> b) & 1]
            for b in range(WINDOW_BITS)
        ]
        idx = np.asarray(
            [
                w * NUM_BUCKETS + k
                for w in range(tw)
                for b in range(WINDOW_BITS)
                for k in per_bit[b]
            ],
            dtype=np.int32,
        )
        _LEAF_IDX_CACHE[tw] = idx
    return idx


@aot_jit(static_argnames=("tw",))
def _grid_leaves(f, scatter_idx, leaf_idx, tw):
    """Scatter the finalized bucket entries into the (tw, NUM_BUCKETS)
    grid (empty buckets patched to the projective identity), then gather
    the bit-plane leaves: (NLIMBS, tw * WINDOW_BITS * 128)."""
    nslots = tw * NUM_BUCKETS + 1
    grid = tuple(
        jnp.zeros((NLIMBS, nslots), dtype=c.dtype)
        .at[:, scatter_idx].set(c)
        for c in f
    )
    grid = tuple(c[:, :-1] for c in grid)
    # empty buckets scatter as all-zero, which the complete add would
    # absorb; patch Y to Montgomery one => (0:1:0) identity
    empty = lf.is_zero(grid[1]) & lf.is_zero(grid[2])
    one = jnp.broadcast_to(lf.mont_one(FQ, 1), grid[1].shape)
    grid = (grid[0], jnp.where(empty, one, grid[1]), grid[2])
    return tuple(c[:, leaf_idx] for c in grid)


@aot_jit
def _fold_pairs(f):
    """One balanced tree level: add even/odd neighbour columns."""
    a = tuple(c[:, 0::2] for c in f)
    b = tuple(c[:, 1::2] for c in f)
    return lc.OPS16.add(a, b)


@aot_jit(static_argnames=("tw",))
def _horner_bits(planes, tw):
    """(NLIMBS, tw*WINDOW_BITS) plane sums, (w, b)-major -> window totals
    sum_b 2^b S_b by Horner (double = complete self-add), stacked
    (3, NLIMBS, tw).

    fori_loop over bit planes, NOT an unrolled Python loop: unrolling
    inlines 14 complete point adds (each ~12 Montgomery muls) into one
    graph and XLA compile time explodes superlinearly (the 8-device CPU
    mesh took 2m36s on this one stage); the loop body compiles the add
    pair once."""
    p = tuple(c.reshape(NLIMBS, tw, WINDOW_BITS) for c in planes)
    t = tuple(c[:, :, WINDOW_BITS - 1] for c in p)

    def body(i, t):
        b = WINDOW_BITS - 2 - i
        t = lc.OPS16.add(t, t)
        plane = tuple(
            jax.lax.dynamic_index_in_dim(c, b, axis=2, keepdims=False)
            for c in p
        )
        return lc.OPS16.add(t, plane)

    t = jax.lax.fori_loop(0, WINDOW_BITS - 1, body, t)
    return jnp.stack(t)


def _use_bucket_scan() -> bool:
    """H2V_BUCKET=scan reverts the bucket phase to the fori_loop
    suffix-scan pair. Read OUTSIDE any jitted function (the choice must be
    part of the jit cache key, not baked in at first trace)."""
    import os

    return os.environ.get("H2V_BUCKET") == "scan"


def _bucket_phase(f, scatter_idx, tw, scan=None):
    """Window totals sum_k k*B_k via the bit decomposition
    k = sum_b 2^b bit_b(k): each bit plane S_b = sum of its 128 buckets
    reduces in a balanced 7-level tree (slice-pair adds, no gathers), and
    the 2^b weights fold in a WINDOW_BITS-step Horner over tw lanes —
    ~tw*(127*8+14) adds vs ~tw*2*255*8 for the summation-by-parts suffix
    scans (arithmetic.rs:86-94) this replaces. The whole phase is static
    given tw, so every level kernel compiles once and is reused by every
    batch. `scan` selects the fallback; None reads H2V_BUCKET (only valid
    when called OUTSIDE a trace — jitted callers must pass it as a static
    arg so the choice keys their jit cache)."""
    if scan is None:
        scan = _use_bucket_scan()
    if scan:
        return _bucket_phase_scan(f, scatter_idx, tw=tw)
    leaves = _grid_leaves(f, scatter_idx,
                          jnp.asarray(_bucket_leaf_idx(tw)), tw=tw)
    while leaves[0].shape[1] > tw * WINDOW_BITS:
        leaves = _fold_pairs(leaves)
    return _horner_bits(leaves, tw=tw)


@partial(jax.jit, static_argnames=("tw",))
def _bucket_phase_scan(f, scatter_idx, tw):
    """Summation-by-parts fallback (two fori_loop suffix scans)."""
    from .msm_jax import _suffix_scan_buckets

    nslots = tw * NUM_BUCKETS + 1
    grid = tuple(
        jnp.zeros((NLIMBS, nslots), dtype=c.dtype)
        .at[:, scatter_idx].set(c)
        for c in f
    )
    grid = tuple(
        c[:, :-1].reshape(NLIMBS, tw, NUM_BUCKETS) for c in grid
    )
    empty = lf.is_zero(grid[1]) & lf.is_zero(grid[2])
    one = jnp.broadcast_to(
        lf.mont_one(FQ, 1)[:, :, None], grid[1].shape
    )
    grid = (grid[0], jnp.where(empty[None], one, grid[1]), grid[2])

    tail = tuple(c[:, :, 1:] for c in grid)
    suffix = _suffix_scan_buckets(tail)
    totals = _suffix_scan_buckets(suffix)
    return jnp.stack([c[:, :, 0] for c in totals])  # (3, NLIMBS, tw)


def _pad_transpose_points(x_np, y_np, n_pad):
    """Shared dispatch preamble: (total, NLIMBS) canonical affine limbs ->
    limbs-major (NLIMBS, n_pad) arrays, identity (0,0) in the pad lanes."""
    total = x_np.shape[0]
    xs = np.zeros((NLIMBS, n_pad), dtype=np.uint32)
    ys = np.zeros((NLIMBS, n_pad), dtype=np.uint32)
    xs[:, :total] = x_np.T
    ys[:, :total] = y_np.T
    return xs, ys


def _plan_scatter_idx(plan):
    """Shared dispatch preamble: concatenated finalized-bucket keys."""
    return np.concatenate([keys for _lvl, _pos, keys in plan["finished"]])


def dispatch_planned(x_np, y_np, plan):
    """Device stage: upload + run the planned forest; returns the
    (3, NLIMBS, tw) window-totals device array WITHOUT synchronizing.

    x_np/y_np: (total, NLIMBS) uint32 CANONICAL affine limbs ((0,0) =
    identity), as the orchestrator assembles them.
    """
    xs, ys = _pad_transpose_points(x_np, y_np, plan["n_pad"])
    src = _convert_points(jnp.asarray(xs), jnp.asarray(ys))
    frontiers = [_gather0(src, jnp.asarray(plan["point_idx0"]))]
    for iL, iR in plan["levels"]:
        frontiers.append(
            _level_add(frontiers[-1], jnp.asarray(iL), jnp.asarray(iR))
        )
    # finalized buckets gather from the frontier level where they reduced
    # to one entry; identity-padded lanes scatter into the dump slot
    gathered = [
        _gather0(frontiers[lvl], jnp.asarray(pos))
        for lvl, pos, _keys in plan["finished"]
    ]
    fin = tuple(
        jnp.concatenate([g[c] for g in gathered], axis=1) for c in range(3)
    )
    return _bucket_phase(fin, jnp.asarray(_plan_scatter_idx(plan)),
                         tw=plan["tw"])


def pin_plan_widths(plan, pinned=None):
    """Pad a plan's frontier widths up to a PINNED per-workload signature
    so every batch of one workload shares one compiled shape set.

    _canonicalize_plan stabilizes the level COUNT and part layout, but
    each level's width still quantizes per batch — random isolation
    weights shift the nonzero-digit counts by ~sqrt(entries), and a width
    sitting near a quantization boundary flips shape class batch to
    batch, retracing/recompiling stage programs MID-STREAM (~13 s/batch
    observed on the k=9 keccak x gwc bench extra before this fix).

    Padding semantics: every frontier's trailing slot is an identity by
    induction (host_plan always leaves >= 1 identity pad slot), so extra
    gather rows (id, id) append identity adds that the complete RCB15
    add absorbs. Finished-part positions keep referencing their original
    (real) slots.

    Returns (plan, widths): pass `widths` back in for the next batch; a
    batch that EXCEEDS the pinned signature re-pins (one recompile, then
    stable again)."""
    import numpy as np

    widths = [plan["point_idx0"].shape[0]] + [
        lvl[0].shape[0] for lvl in plan["levels"]
    ]
    fin_widths = [pos.shape[0] for _lvl, pos, _k in plan["finished"]]
    sig = (tuple(widths), tuple(fin_widths))
    if (pinned is None or len(pinned[0]) != len(widths)
            or len(pinned[1]) != len(fin_widths)
            or any(w > p for w, p in zip(widths, pinned[0]))
            or any(w > p for w, p in zip(fin_widths, pinned[1]))):
        # natural widths grew past the pin (or first batch): re-pin
        if pinned is not None and len(pinned[0]) == len(widths) \
                and len(pinned[1]) == len(fin_widths):
            pinned = (
                tuple(max(w, p) for w, p in zip(widths, pinned[0])),
                tuple(max(w, p) for w, p in zip(fin_widths, pinned[1])),
            )
        else:
            pinned = sig
    pad0 = pinned[0][0] - widths[0]
    if pad0:
        plan["point_idx0"] = np.concatenate([
            plan["point_idx0"],
            np.full(pad0, plan["n_pad"] - 1, dtype=np.int32),
        ])
    levels = []
    pad_adds = 0
    for i, (iL, iR) in enumerate(plan["levels"]):
        pad = pinned[0][i + 1] - iL.shape[0]
        if pad:
            id_slot = pinned[0][i] - 1  # last slot of the padded frontier
            iL = np.concatenate([iL, np.full(pad, id_slot, np.int32)])
            iR = np.concatenate([iR, np.full(pad, id_slot, np.int32)])
            pad_adds += pad
        levels.append((iL, iR))
    plan["levels"] = levels
    dump = plan["tw"] * NUM_BUCKETS
    parts = []
    for pi, (lvl, pos, keys) in enumerate(plan["finished"]):
        pad = pinned[1][pi] - pos.shape[0]
        if pad:
            id_slot = pinned[0][lvl] - 1  # identity slot of frontier lvl
            pos = np.concatenate([pos, np.full(pad, id_slot, np.int32)])
            keys = np.concatenate([keys, np.full(pad, dump, np.int32)])
        parts.append((lvl, pos, keys))
    plan["finished"] = parts
    plan["adds"] = plan["adds"] + pad_adds
    return plan, pinned


# --------------------------------------------------------- partial fusion
#
# The r04 driver bench was launch-bound (~25 dispatches/batch over a
# 2.5-8 ms/launch tunnel floor) AND compile-bound at cold start (~25
# distinct stage programs x ~20-30 s each; the Mosaic point-add kernel is
# recompiled inside every program — benchmarks/exp_compile_r05.py). The
# all-or-nothing fusion (_forest_fused) lost steady-state (no cross-
# program overlap, 0.63x); the middle ground fuses THREE forest levels
# (plus their finished-part gathers) per program — the canonicalized plan
# (_canonicalize_plan) pads the level count to a multiple of 3 precisely
# so these triple signatures stay stable across batches. Launches per
# batch: head + L/3 triples + tail ~= 5-6 instead of ~25; distinct
# compiled programs shrink the same way.


@aot_jit
def _stage_head(xs, ys, idx0):
    """convert + initial gather as one program: canonical affine limbs ->
    level-0 frontier."""
    src = _convert_points.fn(xs, ys)
    return tuple(c[:, idx0] for c in src)


@aot_jit
def _stage_levels3(f, trip, fins):
    """Three forest levels + their finished-part gathers in one program.

    trip: ((iL, iR),) x3 gather pairs; fins: (pos,) x3 finished-part
    positions, fins[j] gathering from the frontier BEFORE level j's add
    (i.e. plan level t+j). Returns (next frontier, 3 finished parts)."""
    parts = []
    for (iL, iR), pos in zip(trip, fins):
        parts.append(tuple(c[:, pos] for c in f))
        a = tuple(c[:, iL] for c in f)
        b = tuple(c[:, iR] for c in f)
        f = lc.OPS16.add(a, b)
    return f, tuple(parts)


@aot_jit(static_argnames=("tw", "bucket_scan"))
def _stage_tail(f_last, pos_last, parts, scatter_idx, *, tw, bucket_scan):
    """Deepest finished-part gather + concat + the whole bucket phase
    (grid scatter, bit-plane tree, Horner) as one program."""
    parts = tuple(parts) + (tuple(c[:, pos_last] for c in f_last),)
    fin = tuple(
        jnp.concatenate([g[c] for g in parts], axis=1) for c in range(3)
    )
    return _bucket_phase(fin, scatter_idx, tw=tw, scan=bucket_scan)


# Packed-operand upload: the fuse3 chain uploads ~30 SEPARATE host
# arrays per batch (xs, ys, idx0, per-level iL/iR, per-part pos,
# scatter) and the tunnel's per-transfer overhead is ~2.5-3 ms
# regardless of size while one large transfer sustains ~1.6 GB/s
# (measured 2026-08-21: 8 MB as 1 transfer = 5 ms, as 16 transfers =
# 46 ms, as 80 = 51 ms). So all operands concatenate into ONE uint32
# buffer, uploaded once, and each stage slices at STATIC offsets —
# static because pin_plan_widths pins every width per workload, so the
# offset tuples are stable across batches and AOT keys don't churn.


@aot_jit(static_argnames=("n_pad", "w0"))
def _stage_head_p(buf, *, n_pad, w0):
    """convert + initial gather, operands sliced from the packed buffer:
    [xs | ys | idx0 | ...] -> level-0 frontier."""
    o = NLIMBS * n_pad
    xs = buf[:o].reshape(NLIMBS, n_pad)
    ys = buf[o:2 * o].reshape(NLIMBS, n_pad)
    idx0 = buf[2 * o:2 * o + w0]
    src = _convert_points.fn(xs, ys)
    return tuple(c[:, idx0] for c in src)


@aot_jit(static_argnames=("offs", "concat_gather"))
def _stage_levels3_p(f, buf, *, offs, concat_gather=False):
    """_stage_levels3 with the gather-index triples sliced from the
    packed buffer. offs: ((oL, oR, w), (oP, wp)) x3, static.

    concat_gather: ONE gather of the [iL | iR] permutation per level and
    the add reads contiguous halves — levels are adjacent in the packed
    buffer so the combined index is a single 2w slice (A/B experiment:
    two gathers vs one double-width gather)."""
    parts = []
    for (oL, oR, w), (oP, wp) in offs:
        pos = buf[oP:oP + wp]
        parts.append(tuple(c[:, pos] for c in f))
        if concat_gather:
            both = buf[oL:oL + 2 * w]
            g = tuple(c[:, both] for c in f)
            f = lc.OPS16.add(tuple(c[:, :w] for c in g),
                             tuple(c[:, w:] for c in g))
        else:
            iL = buf[oL:oL + w]
            iR = buf[oR:oR + w]
            f = lc.OPS16.add(tuple(c[:, iL] for c in f),
                             tuple(c[:, iR] for c in f))
    return f, tuple(parts)


@aot_jit(static_argnames=("pos_off", "scat_off", "tw", "bucket_scan"))
def _stage_tail_p(f_last, parts, buf, *, pos_off, scat_off, tw,
                  bucket_scan):
    """_stage_tail with pos_last/scatter sliced from the packed buffer."""
    oP, wp = pos_off
    parts = tuple(parts) + (
        tuple(c[:, buf[oP:oP + wp]] for c in f_last),)
    fin = tuple(
        jnp.concatenate([g[c] for g in parts], axis=1) for c in range(3)
    )
    oS, ws = scat_off
    scat = buf[oS:oS + ws].astype(jnp.int32)
    return _bucket_phase(fin, scat, tw=tw, scan=bucket_scan)


def _as_u32(a):
    return np.ascontiguousarray(a).view(np.uint32)


def _dispatch_fuse3_packed(x_np, y_np, plan):
    """dispatch_planned_fuse3 with the single packed-operand upload.
    Bit-identical output; requires the canonical plan shape."""
    import os

    levels = plan["levels"]
    parts = plan["finished"]
    L = len(levels)
    n_pad = plan["n_pad"]
    xs, ys = _pad_transpose_points(x_np, y_np, n_pad)
    scat = _plan_scatter_idx(plan)
    w0 = plan["point_idx0"].shape[0]
    segs = [xs.ravel(), ys.ravel(), _as_u32(plan["point_idx0"])]
    off = 2 * NLIMBS * n_pad + w0
    lvl_off = []
    for iL, iR in levels:
        w = iL.shape[0]
        segs += [_as_u32(iL), _as_u32(iR)]
        lvl_off.append((off, off + w, w))
        off += 2 * w
    part_off = []
    for _lvl, pos, _keys in parts:
        wp = pos.shape[0]
        segs.append(_as_u32(pos))
        part_off.append((off, wp))
        off += wp
    ws = scat.shape[0]
    segs.append(_as_u32(scat))
    buf = jnp.asarray(np.concatenate(segs))  # the ONE upload
    f = _stage_head_p(buf, n_pad=n_pad, w0=w0)
    out_parts = []
    for t in range(0, L, 3):
        offs3 = tuple(
            (lvl_off[t + j], part_off[t + j]) for j in range(3)
        )
        f, outs = _stage_levels3_p(
            f, buf, offs=offs3,
            concat_gather=os.environ.get("H2V_LEVEL_GATHER") != "two",
        )
        out_parts.extend(outs)
    return _stage_tail_p(
        f, tuple(out_parts), buf,
        pos_off=part_off[L], scat_off=(off, ws),
        tw=plan["tw"], bucket_scan=_use_bucket_scan(),
    )


def dispatch_planned_fuse3(x_np, y_np, plan):
    """Partial-fusion variant of dispatch_planned: identical math and
    output, ~5-6 launches per batch instead of ~25. Requires the
    canonicalized plan shape (level count % 3 == 0, one finished part per
    level 0..L sorted) that host_plan always produces."""
    levels = plan["levels"]
    parts = plan["finished"]
    L = len(levels)
    if L % 3 != 0 or len(parts) != L + 1 or any(
        parts[i][0] != i for i in range(L + 1)
    ):
        # non-canonical plan (e.g. a hand-built test plan): exact fallback
        return dispatch_planned(x_np, y_np, plan)
    import os

    if os.environ.get("H2V_FOREST_PACK", "1") != "0":
        return _dispatch_fuse3_packed(x_np, y_np, plan)
    xs, ys = _pad_transpose_points(x_np, y_np, plan["n_pad"])
    f = _stage_head(jnp.asarray(xs), jnp.asarray(ys),
                    jnp.asarray(plan["point_idx0"]))
    out_parts = []
    for t in range(0, L, 3):
        trip = tuple(
            (jnp.asarray(iL), jnp.asarray(iR)) for iL, iR in levels[t:t + 3]
        )
        fins = tuple(jnp.asarray(parts[t + j][1]) for j in range(3))
        f, outs = _stage_levels3(f, trip, fins)
        out_parts.extend(outs)
    return _stage_tail(
        f, jnp.asarray(parts[L][1]), tuple(out_parts),
        jnp.asarray(_plan_scatter_idx(plan)),
        tw=plan["tw"], bucket_scan=_use_bucket_scan(),
    )


@partial(jax.jit, static_argnames=("fin_lvls", "tw", "bucket_scan"))
def _forest_fused(xs, ys, idx0, levels, fin_pos, scatter_idx, *, fin_lvls,
                  tw, bucket_scan):
    """The WHOLE planned forest + bucket phase as one traced program.

    Identical math to dispatch_planned's per-stage calls (each inner
    jitted fn inlines under this trace), but the steady-state batch costs
    ONE host->device launch instead of ~25 — per-launch RPC latency over
    the accelerator tunnel dominates the device stage at bench shapes
    (measured ~3.4 ms/launch; see benchmarks/prof_forest_path.py). The
    Mosaic point-add kernel has one fixed block shape, so the many
    inlined pallas_calls share one kernel compile."""
    src = _convert_points(xs, ys)
    frontiers = [_gather0(src, idx0)]
    for iL, iR in levels:
        frontiers.append(_level_add(frontiers[-1], iL, iR))
    gathered = [
        _gather0(frontiers[lvl], pos)
        for lvl, pos in zip(fin_lvls, fin_pos)
    ]
    fin = tuple(
        jnp.concatenate([g[c] for g in gathered], axis=1) for c in range(3)
    )
    return _bucket_phase(fin, scatter_idx, tw=tw, scan=bucket_scan)


def dispatch_planned_fused(x_np, y_np, plan):
    """One-dispatch variant of dispatch_planned (same plan, same output
    array). Shape signature = (point_idx0 width, level widths, finished
    part (level, width) pairs, tw) — all plan-quantized, so repeated
    batches of one workload reuse a single compiled program."""
    xs, ys = _pad_transpose_points(x_np, y_np, plan["n_pad"])
    levels = tuple(
        (jnp.asarray(iL), jnp.asarray(iR)) for iL, iR in plan["levels"]
    )
    fin_lvls = tuple(int(lvl) for lvl, _pos, _keys in plan["finished"])
    fin_pos = tuple(
        jnp.asarray(pos) for _lvl, pos, _keys in plan["finished"]
    )
    return _forest_fused(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(plan["point_idx0"]),
        levels, fin_pos, jnp.asarray(_plan_scatter_idx(plan)),
        fin_lvls=fin_lvls, tw=plan["tw"], bucket_scan=_use_bucket_scan(),
    )


def msm_grouped(scalars_np, x_np, y_np, sizes, fused=False):
    """Convenience wrapper: full grouped MSM via the forest path; returns
    a list of per-group affine points ((x, y) ints or None). Synchronizes.

    fused: False = per-stage chain, True/"all" = one-launch program,
    "fuse3" = triple-level partial fusion (the production default)."""
    from .msm_jax import combine_window_totals_grouped

    plan = host_plan(scalars_np, sizes)
    dispatch = {
        False: dispatch_planned,
        True: dispatch_planned_fused,
        "all": dispatch_planned_fused,
        "fuse3": dispatch_planned_fuse3,
    }[fused]
    arr = dispatch(x_np, y_np, plan)
    return combine_window_totals_grouped(arr, len(sizes))
