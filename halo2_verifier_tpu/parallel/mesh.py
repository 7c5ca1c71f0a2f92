"""Device-mesh utilities and the sharded MSM.

Parallelism model (SURVEY.md §2.3):
- DP (proof-level): proofs are embarrassingly parallel; their DualMSM
  contributions concatenate into one entry list (AccumulatorStrategy
  algebra, kzg/strategy.rs:125-141).
- TP (point-level): one big MSM's entries are sharded across chips on a 1-D
  mesh; each chip runs the full Pippenger pipeline on its slice and the
  per-chip projective partials are combined with a log-depth reduction.
  Communication is 3 field elements per chip per MSM — ICI cost is
  negligible, so scaling efficiency tracks the per-chip Pippenger runtime.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import curve_jax as cj
from ..ops import msm_jax
from ..ops.limbs import NLIMBS


def make_mesh(n_devices: int | None = None, axis: str = "points") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _partial_msm(scalars, xs, ys):
    """shard_map body: per-device partial MSM over this device's slice;
    the (3, NLIMBS)-sized projective partial is the only thing that leaves
    the chip."""
    part = msm_jax.msm_impl(scalars, xs, ys)
    return tuple(c[None] for c in part)  # (1, NLIMBS) per device


def sharded_msm(mesh: Mesh, scalars, xs, ys):
    """MSM with entries sharded over the mesh's 'points' axis.

    Inputs must have leading dim divisible by the mesh size (pad with zero
    scalars to align — zero-scalar entries contribute nothing). Per-device
    partials concatenate to (D, NLIMBS) and reduce with D-1 complete adds
    (bytes of traffic; the collective cost is negligible vs Pippenger).
    """
    ndev = mesh.devices.size

    def pipeline(scalars, xs, ys):
        parts = jax.shard_map(
            _partial_msm,
            mesh=mesh,
            in_specs=(P("points"), P("points"), P("points")),
            out_specs=(P("points"), P("points"), P("points")),
        )(scalars, xs, ys)
        acc = tuple(c[0] for c in parts)
        for d in range(1, ndev):
            acc = cj.add(acc, tuple(c[d] for c in parts))
        return acc

    return jax.jit(pipeline)(scalars, xs, ys)


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
