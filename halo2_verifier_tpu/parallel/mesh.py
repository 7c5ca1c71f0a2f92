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


def _partial_then_reduce(scalars, xs, ys):
    """shard_map body: per-device partial MSM, then an all-gather +
    tree-reduce of the tiny projective partials."""
    part = msm_jax.msm_impl(scalars, xs, ys)  # (3, NLIMBS) pytree
    gathered = tuple(
        jax.lax.all_gather(c, "points") for c in part
    )  # (D, NLIMBS) each
    acc = tuple(c[0] for c in gathered)
    ndev = gathered[0].shape[0]
    for d in range(1, ndev):
        acc = cj.add(acc, tuple(c[d] for c in gathered))
    return acc


def sharded_msm(mesh: Mesh, scalars, xs, ys):
    """MSM with entries sharded over the mesh's 'points' axis.

    Inputs must have leading dim divisible by the mesh size (pad with zero
    scalars to align — zero-scalar entries contribute nothing).
    """
    fn = jax.jit(
        jax.shard_map(
            _partial_then_reduce,
            mesh=mesh,
            in_specs=(P("points"), P("points"), P("points")),
            out_specs=(P(), P(), P()),
        )
    )
    return fn(scalars, xs, ys)


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
