"""Device-mesh utilities and the sharded MSM.

Parallelism model (SURVEY.md §2.3):
- DP (proof-level): proofs are embarrassingly parallel; their DualMSM
  contributions concatenate into one entry list (AccumulatorStrategy
  algebra, kzg/strategy.rs:125-141).
- TP (point-level): one big MSM's entries are sharded across chips on a 1-D
  mesh; each chip runs the full Pippenger bucket pipeline on its slice and
  only its 32 projective window totals (6 KB) leave the chip — the host
  folds them with exact arithmetic (ops/msm_jax.combine_window_totals).
  ICI/DCN traffic is bytes per MSM, so scaling efficiency tracks the
  per-chip Pippenger runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import msm_jax
from ..ops.limbs import NLIMBS


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


# ------------------------------------------------ multi-process plumbing
#
# The same shard_map programs run on a single-process mesh and on a global
# multi-host mesh (parallel/dist.py). The only difference is array
# placement: a multi-process jit cannot consume plain numpy inputs (this
# process does not address every shard), and a host fetch cannot read
# non-addressable shards. These two helpers are the entire difference —
# every host value they upload is computed identically on every process
# (SPMD host replay), so each process can supply any shard from its own
# full copy.


def _multiproc() -> bool:
    return jax.process_count() > 1


def to_global(mesh: Mesh, arr, spec):
    """Host array -> global device array for `mesh` with PartitionSpec
    `spec`: plain jnp.asarray in single-process mode;
    make_array_from_callback (each process supplying its addressable
    shards from its full host copy) when the mesh spans processes."""
    if not _multiproc():
        return jnp.asarray(arr)
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


def fetch_global(arr):
    """np.asarray that also works for multi-process global arrays (gathers
    non-addressable shards over DCN; every process must call it — true in
    SPMD replay, where every process runs the same collect)."""
    import numpy as np

    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def _partial_wt(scalars, xs, ys):
    """shard_map body: per-device Pippenger window totals over this device's
    entry slice; (3, NLIMBS, W) is the only thing that leaves the chip."""
    wt = msm_jax.window_totals_impl(scalars, xs, ys)
    return tuple(c[None] for c in wt)  # (1, NLIMBS, W) per device


def sharded_window_totals(mesh: Mesh, scalars, xs, ys):
    """Per-device window totals with entries sharded over 'points'.

    Inputs must have leading dim divisible by the mesh size (pad with zero
    scalars — they contribute nothing). Returns 3 device arrays of shape
    (D, NLIMBS, W); combine with `combine_sharded` (host)."""

    def pipeline(scalars, xs, ys):
        return jax.shard_map(
            _partial_wt,
            mesh=mesh,
            in_specs=(P("points"), P("points"), P("points")),
            out_specs=(P("points"), P("points"), P("points")),
        )(scalars, xs, ys)

    return jax.jit(pipeline)(scalars, xs, ys)


def combine_sharded(parts):
    """(D, NLIMBS, W) triple -> host affine point: per-device window totals
    are summed per window then Horner-folded, all in exact host math."""
    import numpy as np

    arrs = [np.asarray(c) for c in parts]
    ndev = arrs[0].shape[0]
    wts = [tuple(a[d] for a in arrs) for d in range(ndev)]
    return msm_jax.combine_window_totals(wts)


def sharded_msm(mesh: Mesh, scalars, xs, ys):
    """Full sharded MSM -> host affine point (x, y) or None."""
    return combine_sharded(sharded_window_totals(mesh, scalars, xs, ys))


# ------------------------------------------------ grouped presorted path

_SHARDED_PRESORTED_CACHE: dict = {}


def sharded_window_totals_presorted(mesh: Mesh, xs, ys, idx_sorted,
                                    keys_sorted, total_windows: int,
                                    levels: int,
                                    backend: str | None = None):
    """Sharded grouped MSM: host-sorted (idx, key) entries shard across the
    'points' axis; points replicate (the whole table is KBs). Bucket sums
    are linear, so a segment split across a device boundary contributes two
    partial sums whose window totals add up exactly. Returns a
    (D, 3, NLIMBS, total_windows) device array without synchronizing."""
    backend = backend or msm_jax.default_backend()
    cache_key = (mesh, total_windows, levels,
                 idx_sorted.shape[0], xs.shape[0], backend)
    fn = _SHARDED_PRESORTED_CACHE.get(cache_key)
    if fn is None:
        def body(xs, ys, idx, keys):
            wt = msm_jax.window_totals_presorted_impl(
                xs, ys, idx, keys, total_windows, levels, backend
            )
            return wt[None]

        fn = jax.jit(jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P("points"), P("points")),
            out_specs=P("points"),
        ))
        _SHARDED_PRESORTED_CACHE[cache_key] = fn
    return fn(to_global(mesh, xs, P()), to_global(mesh, ys, P()),
              to_global(mesh, idx_sorted, P("points")),
              to_global(mesh, keys_sorted, P("points")))


def combine_sharded_grouped(arr, groups: int):
    """(D, 3, NLIMBS, g*W) -> list of g host affine points: per-device
    window totals summed per window, then Horner-folded (exact host math).
    ONE device->host fetch (cross-process gather on a multi-host mesh)."""
    arr_np = fetch_global(arr)
    ndev = arr_np.shape[0]
    W = msm_jax.NUM_WINDOWS
    out = []
    for gi in range(groups):
        sl = slice(gi * W, (gi + 1) * W)
        wts = [
            tuple(arr_np[d][c][:, sl] for c in range(3))
            for d in range(ndev)
        ]
        out.append(msm_jax.combine_window_totals(wts))
    return out


# ------------------------------------------------ sharded addition forest
#
# The forest MSM (ops/msm_forest.py), sharded two ways in ONE shard_map
# program:
# 1. POINTS: each chip plans and runs an addition forest over its slice of
#    the points (bucket sums are linear — per-chip partial buckets add up
#    exactly). Per-chip plans are padded to a common structure (level
#    count, per-level widths, finished-part widths) so the SPMD program is
#    shape-uniform; quantized widths make the pads tiny.
# 2. WINDOWS: the bucket-reduction phase does ~tw*1030 adds regardless of
#    point count, so replicating it would cap strong scaling at a few
#    chips. Instead every chip's partial bucket GRID is exchanged with
#    jax.lax.all_to_all over the window axis; each chip tree-reduces the D
#    partials for its tw/D windows and runs the bit-plane reduction on
#    just those. ICI traffic: (3, NLIMBS, tw, 256) u32 per chip (~12 MB at
#    tw=64), far below ICI bandwidth at batch rates.

_SHARDED_FOREST_CACHE: dict = {}


def _pad_plans_uniform(plans):
    """Pad per-chip plans to one common structure (same level count and
    widths, same finished-part layout) so a single SPMD program serves
    every chip. Dummy levels/parts are identity/dump no-ops."""
    import numpy as np

    D = len(plans)
    w_pad = max(p["point_idx0"].shape[0] for p in plans)
    n_levels = max(len(p["levels"]) for p in plans)
    level_w = [
        max((p["levels"][li][0].shape[0] if li < len(p["levels"]) else 1)
            for p in plans)
        for li in range(n_levels)
    ]
    # finished parts keyed by frontier level 0..n_levels
    part_w = [0] * (n_levels + 1)
    for p in plans:
        for lvl, pos, _k in p["finished"]:
            part_w[lvl] = max(part_w[lvl], pos.shape[0])
    tw = plans[0]["tw"]
    dump = tw * msm_jax.NUM_BUCKETS
    out = []
    for p in plans:
        idx0 = p["point_idx0"]
        id0 = int(idx0[-1])  # identity slot of the padded point array
        if idx0.shape[0] < w_pad:
            idx0 = np.concatenate(
                [idx0, np.full(w_pad - idx0.shape[0], id0, np.int32)]
            )
        prev_w = w_pad
        levels = []
        for li in range(n_levels):
            W = level_w[li]
            if li < len(p["levels"]):
                iL, iR = p["levels"][li]
                if iL.shape[0] < W:
                    padv = np.full(W - iL.shape[0], prev_w - 1, np.int32)
                    iL = np.concatenate([iL, padv])
                    iR = np.concatenate([iR, padv])
            else:
                iL = np.full(W, prev_w - 1, np.int32)
                iR = iL
            levels.append((iL, iR))
            prev_w = W
        fparts = {lvl: (pos, keys) for lvl, pos, keys in p["finished"]}
        parts = []
        widths = [w_pad] + level_w
        for lvl in range(n_levels + 1):
            W = part_w[lvl]
            if not W:
                continue
            if lvl in fparts:
                pos, keys = fparts[lvl]
                if pos.shape[0] < W:
                    pos = np.concatenate(
                        [pos,
                         np.full(W - pos.shape[0], widths[lvl] - 1,
                                 np.int32)]
                    )
                    keys = np.concatenate(
                        [keys, np.full(W - keys.shape[0], dump, np.int32)]
                    )
            else:
                pos = np.full(W, widths[lvl] - 1, np.int32)
                keys = np.full(W, dump, np.int32)
            parts.append((lvl, pos, keys))
        out.append({"point_idx0": idx0, "levels": levels,
                    "finished": parts, "tw": tw})
    return out


def sharded_forest_window_totals(mesh: Mesh, x_np, y_np, s_np, sizes,
                                 stats: dict | None = None):
    """Forest MSM sharded over the mesh; returns a (D, 3, NLIMBS, tw/D)
    device array (chip d holds windows [d*tw/D, (d+1)*tw/D)) without
    synchronizing. Host side: split points per chip, plan per chip, pad
    plans to a uniform structure.

    stats (optional dict): filled with the wire accounting — host->device
    upload bytes, per-chip ICI collective bytes (the bucket-grid
    all_to_all), per-chip fetch bytes, and host plan seconds. These are
    the D-independent fixed costs that bound scaling efficiency
    (BASELINE.md metric 3) — reportable even on one chip."""
    import time as _time

    import numpy as np

    _t_plan0 = _time.time()

    from ..ops import msm_forest as mf
    from ..ops import lmcurve as lc
    from ..ops import lmfield as lf
    from ..ops.field_jax import FQ

    D = mesh.devices.size
    tw = len(sizes) * msm_jax.NUM_WINDOWS
    assert tw % D == 0, "mesh size must divide total windows"

    # split each group's rows into D near-equal chunks
    plans = []
    xparts, yparts = [], []
    offs = np.cumsum([0] + list(sizes))
    for d in range(D):
        sl_sizes = []
        rows = []
        for g, sz in enumerate(sizes):
            lo = offs[g] + (sz * d) // D
            hi = offs[g] + (sz * (d + 1)) // D
            sl_sizes.append(hi - lo)
            rows.append(np.arange(lo, hi))
        rows = np.concatenate(rows)
        plans.append(mf.host_plan(
            np.ascontiguousarray(s_np[rows]), sl_sizes))
        xparts.append(x_np[rows])
        yparts.append(y_np[rows])
    n_pad = max(p["n_pad"] for p in plans)
    for p in plans:
        p["n_pad"] = n_pad
    plans = _pad_plans_uniform(plans)

    xs = np.zeros((D, NLIMBS, n_pad), dtype=np.uint32)
    ys = np.zeros((D, NLIMBS, n_pad), dtype=np.uint32)
    for d in range(D):
        xs[d, :, :xparts[d].shape[0]] = xparts[d].T
        ys[d, :, :yparts[d].shape[0]] = yparts[d].T

    if stats is not None:
        lv = plans[0]["levels"]
        fin = plans[0]["finished"]
        stats.update(
            plan_seconds=round(_time.time() - _t_plan0, 6),
            upload_bytes=int(
                xs.nbytes + ys.nbytes
                + D * 4 * (plans[0]["point_idx0"].shape[0]
                           + 2 * sum(l[0].shape[0] for l in lv)
                           + 2 * sum(p[1].shape[0] for p in fin))
            ),
            # the bucket-grid all_to_all: each chip exchanges its full
            # (3, NLIMBS, tw, 256) u32 partial grid
            collective_bytes_per_chip=int(
                3 * NLIMBS * tw * msm_jax.NUM_BUCKETS * 4
            ),
            fetch_bytes_per_chip=int(3 * NLIMBS * (tw // D) * 4),
        )

    # staged SPMD execution: each stage is a SMALL shard_map jit, cached
    # per (mesh, stage) with jax.jit's own shape cache on top — one big
    # fused body would recompile for minutes whenever a level structure
    # changes, and every stage here is reused across width classes
    st = _forest_stages(mesh, D)
    sh = lambda a: to_global(mesh, a, P("points"))  # noqa: E731
    f = st["convert_gather"](sh(xs), sh(ys),
                             sh(np.stack(
                                 [p["point_idx0"] for p in plans])))
    frontiers = [f]
    for li in range(len(plans[0]["levels"])):
        iL = np.stack([p["levels"][li][0] for p in plans])
        iR = np.stack([p["levels"][li][1] for p in plans])
        frontiers.append(st["level_add"](frontiers[-1], sh(iL), sh(iR)))
    parts = []
    for pi, (lvl, _pos, _keys) in enumerate(plans[0]["finished"]):
        pos = np.stack([p["finished"][pi][1] for p in plans])
        parts.append(st["part_gather"](frontiers[lvl], sh(pos)))
    keys = np.concatenate(
        [np.stack([p["finished"][pi][2] for p in plans])
         for pi in range(len(plans[0]["finished"]))], axis=1)
    red = st["scatter_exchange"](sh(keys), *parts, tw=tw)
    leaf_idx = to_global(mesh, mf._bucket_leaf_idx(tw // D), P())
    leaves = st["leaf_gather"](red, leaf_idx)
    while leaves.shape[3] > (tw // D) * msm_jax.WINDOW_BITS:
        leaves = st["fold_pairs"](leaves)
    return st["horner"](leaves)


def _forest_stages(mesh: Mesh, D: int):
    """Per-mesh staged shard_map jits for the sharded forest. Every array
    carries a leading device axis sharded over 'points'; frontiers are
    stacked (D, 3, NLIMBS, W)."""
    key = (mesh, "forest_stages")
    st = _SHARDED_FOREST_CACHE.get(key)
    if st is not None:
        return st

    from ..ops import lmcurve as lc
    from ..ops import lmfield as lf
    from ..ops.field_jax import FQ

    spec = P("points")

    def sm(fn, n_in, extra_specs=()):
        return jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=tuple([spec] * n_in) + tuple(extra_specs),
            out_specs=spec,
        ))

    def convert_gather(xs, ys, idx0):
        src = _forest_convert(xs[0], ys[0], lf, lc, FQ)
        f = tuple(c[:, idx0[0]] for c in src)
        return jnp.stack(f)[None]

    def convert_gather_rep(xs, ys, idx0):
        # replicated point table (window-sharded layout); idx0 sharded
        src = _forest_convert(xs, ys, lf, lc, FQ)
        f = tuple(c[:, idx0[0]] for c in src)
        return jnp.stack(f)[None]

    def convert_gather_ag(xs, ys, idx0):
        # column-sharded point table: the host uploads 1/D of the table
        # to each chip and ONE tiled ICI all_gather rebuilds the full
        # copy on-chip — host->device bytes (the 16-chip bottleneck in
        # the r04 wire model) scale 1/D while the (D-1)/D remainder
        # rides ICI, which is an order of magnitude faster than the
        # host link. Math past this point is identical to the
        # replicated layout.
        xs_full = jax.lax.all_gather(xs, "points", axis=1, tiled=True)
        ys_full = jax.lax.all_gather(ys, "points", axis=1, tiled=True)
        src = _forest_convert(xs_full, ys_full, lf, lc, FQ)
        f = tuple(c[:, idx0[0]] for c in src)
        return jnp.stack(f)[None]

    def level_add(f, iL, iR):
        fc = tuple(f[0, c] for c in range(3))
        a = tuple(c[:, iL[0]] for c in fc)
        b = tuple(c[:, iR[0]] for c in fc)
        return jnp.stack(lc.OPS16.add(a, b))[None]

    def part_gather(f, pos):
        return f[:, :, :, pos[0]]

    def leaf_gather(red, leaf_idx):
        return red[:, :, :, leaf_idx]

    def fold_pairs(leaves):
        fc = tuple(leaves[0, c] for c in range(3))
        a = tuple(c[:, 0::2] for c in fc)
        b = tuple(c[:, 1::2] for c in fc)
        return jnp.stack(lc.OPS16.add(a, b))[None]

    def horner(leaves):
        # fori_loop over bit planes (see msm_forest._horner_bits): the
        # unrolled form inlined 14 complete adds and took minutes to
        # compile on the CPU mesh
        twd = leaves.shape[3] // msm_jax.WINDOW_BITS
        p = tuple(
            leaves[0, c].reshape(NLIMBS, twd, msm_jax.WINDOW_BITS)
            for c in range(3)
        )
        t = tuple(c[:, :, msm_jax.WINDOW_BITS - 1] for c in p)

        def body(i, t):
            bbit = msm_jax.WINDOW_BITS - 2 - i
            t = lc.OPS16.add(t, t)
            plane = tuple(
                jax.lax.dynamic_index_in_dim(c, bbit, axis=2,
                                             keepdims=False)
                for c in p
            )
            return lc.OPS16.add(t, plane)

        t = jax.lax.fori_loop(0, msm_jax.WINDOW_BITS - 1, body, t)
        return jnp.stack(t)[None]

    st = {
        "convert_gather": sm(convert_gather, 3),
        "convert_gather_rep": jax.jit(jax.shard_map(
            convert_gather_rep, mesh=mesh,
            in_specs=(P(), P(), spec), out_specs=spec,
        )),
        "convert_gather_ag": jax.jit(jax.shard_map(
            convert_gather_ag, mesh=mesh,
            in_specs=(P(None, "points"), P(None, "points"), spec),
            out_specs=spec,
        )),
        "level_add": sm(level_add, 3),
        "part_gather": sm(part_gather, 2),
        "leaf_gather": sm(leaf_gather, 1, extra_specs=(P(),)),
        "fold_pairs": sm(fold_pairs, 1),
        "horner": sm(horner, 1),
    }

    def scatter_exchange_outer(keys, *parts, tw):
        def body(keys, *parts):
            fin = tuple(
                jnp.concatenate([p[0, c] for p in parts], axis=1)
                for c in range(3)
            )
            nslots = tw * msm_jax.NUM_BUCKETS + 1
            grid = tuple(
                jnp.zeros((NLIMBS, nslots), dtype=c.dtype)
                .at[:, keys[0]].set(c)
                for c in fin
            )
            grid = tuple(c[:, :-1] for c in grid)
            empty = lf.is_zero(grid[1]) & lf.is_zero(grid[2])
            one = jnp.broadcast_to(lf.mont_one(FQ, 1), grid[1].shape)
            grid = (grid[0], jnp.where(empty, one, grid[1]), grid[2])
            ex = tuple(
                jax.lax.all_to_all(
                    c.reshape(NLIMBS, 1, tw * msm_jax.NUM_BUCKETS),
                    "points", split_axis=2, concat_axis=1, tiled=True,
                )
                for c in grid
            )
            red = ex
            while red[0].shape[1] > 1:
                half = red[0].shape[1] // 2
                a = tuple(c[:, :half] for c in red)
                b = tuple(c[:, half:2 * half] for c in red)
                s = lc.OPS16.add(a, b)
                if red[0].shape[1] & 1:
                    s = tuple(
                        jnp.concatenate([sc, c[:, 2 * half:]], axis=1)
                        for sc, c in zip(s, red)
                    )
                red = s
            return jnp.stack(tuple(c[:, 0] for c in red))[None]

        fkey = (mesh, "scatter_exchange", tw, len(parts))
        fn = _SHARDED_FOREST_CACHE.get(fkey)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=tuple([spec] * (1 + len(parts))),
                out_specs=spec,
            ))
            _SHARDED_FOREST_CACHE[fkey] = fn
        return fn(keys, *parts)

    st["scatter_exchange"] = scatter_exchange_outer

    def scatter_local_outer(keys, *parts, tw):
        # window-sharded layout: keys are LOCAL to this chip's windows —
        # plain scatter + identity patch, no collective
        def body(keys, *parts):
            fin = tuple(
                jnp.concatenate([p[0, c] for p in parts], axis=1)
                for c in range(3)
            )
            nslots = tw * msm_jax.NUM_BUCKETS + 1
            grid = tuple(
                jnp.zeros((NLIMBS, nslots), dtype=c.dtype)
                .at[:, keys[0]].set(c)
                for c in fin
            )
            grid = tuple(c[:, :-1] for c in grid)
            empty = lf.is_zero(grid[1]) & lf.is_zero(grid[2])
            one = jnp.broadcast_to(lf.mont_one(FQ, 1), grid[1].shape)
            grid = (grid[0], jnp.where(empty, one, grid[1]), grid[2])
            return jnp.stack(grid)[None]

        fkey = (mesh, "scatter_local", tw, len(parts))
        fn = _SHARDED_FOREST_CACHE.get(fkey)
        if fn is None:
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=tuple([spec] * (1 + len(parts))),
                out_specs=spec,
            ))
            _SHARDED_FOREST_CACHE[fkey] = fn
        return fn(keys, *parts)

    st["scatter_local"] = scatter_local_outer
    _SHARDED_FOREST_CACHE[key] = st
    return st


# ---------------------------------------------- window-sharded forest
#
# The preferred multi-chip layout when D divides NUM_WINDOWS: chip d
# plans and runs a forest over windows [d*W/D, (d+1)*W/D) of EVERY group,
# across ALL points (points replicate — KBs at serving shapes). No
# collective at all: per-chip work is ~(entries + bucket phase)/D and the
# only thing leaving a chip is its (3, NLIMBS, tw/D) window totals.
# Contrast sharded_forest_window_totals (points sharded + all_to_all
# bucket exchange), which wins only when the point table itself is too
# large to replicate.


def sharded_forest_by_windows(mesh: Mesh, x_np, y_np, s_np, sizes,
                              stats: dict | None = None):
    """Window-sharded forest MSM; returns (D, 3, NLIMBS, tw/D) without
    synchronizing — chip d holds windows [d*W/D, (d+1)*W/D) of each
    group. Combine with combine_sharded_windows.

    stats (optional dict): wire accounting — host->device upload bytes,
    per-chip ICI collective bytes (ZERO here: nothing crosses chips),
    per-chip fetch bytes, host plan seconds. The D-independent fixed
    costs that bound scaling efficiency (BASELINE.md metric 3)."""
    import time as _time

    import numpy as np

    from ..ops import msm_forest as mf

    _t_plan0 = _time.time()
    D = mesh.devices.size
    W = msm_jax.NUM_WINDOWS
    assert W % D == 0, "mesh size must divide NUM_WINDOWS"
    wpc = W // D
    plans = [
        mf.host_plan(s_np, sizes, window_lo=d * wpc, window_count=wpc)
        for d in range(D)
    ]
    n_pad = plans[0]["n_pad"]  # same points => same padding everywhere
    plans = _pad_plans_uniform(plans)
    tw_local = plans[0]["tw"]

    import os as _os

    xs = np.zeros((NLIMBS, n_pad), dtype=np.uint32)
    ys = np.zeros((NLIMBS, n_pad), dtype=np.uint32)
    xs[:, :x_np.shape[0]] = x_np.T
    ys[:, :y_np.shape[0]] = y_np.T

    # upload layout: default = column-sharded table + one on-chip ICI
    # all_gather (per-chip host->device bytes scale 1/D — the projected
    # 16-chip bottleneck was the replicated upload, VERDICT r04 #6);
    # H2V_MESH_UPLOAD=replicate reverts to replicating the full table
    # from the host (A/B + odd meshes where D doesn't divide n_pad)
    shard_upload = (_os.environ.get("H2V_MESH_UPLOAD") != "replicate"
                    and n_pad % D == 0)

    if stats is not None:
        lv = plans[0]["levels"]
        fin = plans[0]["finished"]
        idx_bytes_per_chip = 4 * (
            plans[0]["point_idx0"].shape[0]
            + 2 * sum(l[0].shape[0] for l in lv)
            + 2 * sum(p[1].shape[0] for p in fin)
        )
        table_bytes = int(xs.nbytes + ys.nbytes)
        stats.update(
            plan_seconds=round(_time.time() - _t_plan0, 6),
            upload_bytes=int(
                (table_bytes if shard_upload else D * table_bytes)
                + D * idx_bytes_per_chip
            ),
            upload_bytes_per_chip=int(
                (table_bytes // D if shard_upload else table_bytes)
                + idx_bytes_per_chip
            ),
            # sharded upload: each chip receives the other (D-1)/D of
            # the table over ICI; replicated upload crosses no chips
            collective_bytes_per_chip=int(
                table_bytes * (D - 1) // D if shard_upload else 0
            ),
            fetch_bytes_per_chip=int(3 * NLIMBS * tw_local * 4),
        )

    st = _forest_stages(mesh, D)
    sh = lambda a: to_global(mesh, a, P("points"))  # noqa: E731
    idx0 = sh(np.stack([p["point_idx0"] for p in plans]))
    if shard_upload:
        f = st["convert_gather_ag"](
            to_global(mesh, xs, P(None, "points")),
            to_global(mesh, ys, P(None, "points")), idx0)
    else:
        f = st["convert_gather_rep"](
            to_global(mesh, xs, P()), to_global(mesh, ys, P()), idx0)
    frontiers = [f]
    for li in range(len(plans[0]["levels"])):
        iL = np.stack([p["levels"][li][0] for p in plans])
        iR = np.stack([p["levels"][li][1] for p in plans])
        frontiers.append(st["level_add"](frontiers[-1], sh(iL), sh(iR)))
    parts = []
    for pi, (lvl, _pos, _keys) in enumerate(plans[0]["finished"]):
        pos = np.stack([p["finished"][pi][1] for p in plans])
        parts.append(st["part_gather"](frontiers[lvl], sh(pos)))
    keys = np.concatenate(
        [np.stack([p["finished"][pi][2] for p in plans])
         for pi in range(len(plans[0]["finished"]))], axis=1)
    red = st["scatter_local"](sh(keys), *parts, tw=tw_local)
    leaf_idx = to_global(mesh, mf._bucket_leaf_idx(tw_local), P())
    leaves = st["leaf_gather"](red, leaf_idx)
    while leaves.shape[3] > tw_local * msm_jax.WINDOW_BITS:
        leaves = st["fold_pairs"](leaves)
    return st["horner"](leaves)


def combine_sharded_windows(arr, groups: int):
    """(D, 3, NLIMBS, groups*wpc) per-chip window totals -> per-group host
    affine points. Chip d's local window g*wpc+j is global window
    d*wpc+j of group g. ONE fetch (cross-process gather on a multi-host
    mesh)."""
    import numpy as np

    arr_np = fetch_global(arr)
    D = arr_np.shape[0]
    W = msm_jax.NUM_WINDOWS
    wpc = arr_np.shape[3] // groups
    assert wpc * D == W
    full = np.zeros((3, NLIMBS, groups * W), dtype=arr_np.dtype)
    for g in range(groups):
        for d in range(D):
            full[:, :, g * W + d * wpc:(g * W + (d + 1) * wpc)] = (
                arr_np[d][:, :, g * wpc:(g + 1) * wpc]
            )
    return msm_jax.combine_window_totals_grouped(full, groups)


def _forest_convert(xs, ys, lf, lc, FQ):
    b = xs.shape[1]
    r2 = jnp.broadcast_to(FQ.r2_limbs.reshape(NLIMBS, 1), (NLIMBS, b))
    gx = lf.mont_mul(xs, r2, FQ)
    gy = lf.mont_mul(ys, r2, FQ)
    return lc.from_affine(gx, gy)


def combine_sharded_forest(arr, groups: int):
    """(D, 3, NLIMBS, tw/D) -> per-group host affine points. Chip d owns
    the contiguous global window range [d*tw/D, (d+1)*tw/D), so the device
    axis concatenates back into global window order. ONE fetch."""
    import numpy as np

    arr_np = fetch_global(arr)  # (D, 3, NLIMBS, twd)
    full = np.concatenate([arr_np[d] for d in range(arr_np.shape[0])],
                          axis=2)  # (3, NLIMBS, tw)
    return msm_jax.combine_window_totals_grouped(full, groups)


def pad_entries(scalars, xs, ys, multiple: int):
    """Pad entry arrays to a multiple of the mesh size with zero scalars."""
    n = scalars.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return scalars, xs, ys
    padz = jnp.zeros((rem, NLIMBS), dtype=scalars.dtype)
    return (
        jnp.concatenate([scalars, padz]),
        jnp.concatenate([xs, padz]),
        jnp.concatenate([ys, padz]),
    )
