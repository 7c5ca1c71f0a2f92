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
    return fn(xs, ys, idx_sorted, keys_sorted)


def combine_sharded_grouped(arr, groups: int):
    """(D, 3, NLIMBS, g*W) -> list of g host affine points: per-device
    window totals summed per window, then Horner-folded (exact host math).
    ONE device->host fetch."""
    import numpy as np

    arr_np = np.asarray(arr)
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
