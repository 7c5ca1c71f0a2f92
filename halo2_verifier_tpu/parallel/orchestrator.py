"""Batch-verification orchestrator: the TPU-native DP/TP pipeline.

Pipeline (BASELINE.json north star):
1. HOST, per proof (batch-parallel, sequential hashing): transcript replay
   via protocol/verifier.py with AccumulatorStrategy — produces one DualMSM
   whose left/right entry lists concatenate every proof's contribution,
   isolated by fresh random weights (kzg/strategy.rs:125-136).
2. DEVICE: the two big MSMs run as (optionally sharded) Pippenger kernels.
3. HOST: one pairing check for the whole batch (kzg/msm.rs:185-203).
4. Failure localization: finalize() only says *some* proof failed
   (strategy.rs:28-30); localize() bisects by re-evaluating sub-batches
   with the already-collected per-proof MSM slices — no re-hashing needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..ops import msm_jax
from ..ops import field_jax as fj
from ..ops import hostcurve as hc
from ..ops import hostpairing as hp
from ..ops.constants import P, R
from ..ops.limbs import ints_to_limbs
from ..protocol.kzg import AccumulatorStrategy, DualMSM, VerifyFailure
from ..protocol.verifier import verify_proof
from ..transcript import TRANSCRIPT_READERS
from ..utils.metrics import StageTimings
import numpy as np
import secrets


def _entries_to_device(msm):
    """MSMKZG -> device arrays (scalars canonical, points Montgomery)."""
    xs, ys, ss = [], [], []
    for s, pt in zip(msm.scalars, msm.bases):
        ss.append(s % R)
        if pt is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(pt[0] * fj.FQ.mont_r % P)
            ys.append(pt[1] * fj.FQ.mont_r % P)
    return (
        jnp.asarray(ints_to_limbs(ss)),
        jnp.asarray(ints_to_limbs(xs)),
        jnp.asarray(ints_to_limbs(ys)),
    )


def _device_point_to_host(dispatched):
    """Synchronize a dispatched MSM: fold its (possibly per-device) window
    totals into the final affine point with exact host math."""
    kind, wt = dispatched
    if kind == "sharded":
        from .mesh import combine_sharded

        return combine_sharded(wt)
    return msm_jax.combine_window_totals(wt)


@dataclass
class BatchResult:
    ok: bool
    num_proofs: int
    failed_indices: list = field(default_factory=list)


class BatchVerifier:
    """Verify many proofs with one deferred pairing, device MSMs, and
    optional mesh sharding."""

    def __init__(self, params, vk, multiopen="shplonk", hash_name="blake2b",
                 mesh=None, rng=None):
        self.params = params
        self.vk = vk
        self.multiopen = multiopen
        self.hash_name = hash_name
        self.mesh = mesh
        self._rng = rng or (lambda: 1 + secrets.randbelow(R - 1))
        self.timings = StageTimings()

    # ------------------------------------------------------------ replay
    def replay(self, proofs_and_instances):
        """Host stage: replay every proof's transcript; returns the list of
        per-proof DualMSMs (unevaluated) or raises on malformed proofs.

        Items are (proof, instances) pairs, or (proof, instances, vk)
        triples for heterogeneous-circuit batches (BASELINE config 4: the
        accumulated DualMSMs are vk-independent, so proofs of different
        circuits still share the device MSMs and the single pairing)."""
        duals = []
        for item in proofs_and_instances:
            with self.timings.stage("host_replay"):
                duals.append(self._replay_one(*item))
        return duals

    def _replay_one(self, proof, instances, vk=None):
        transcript = TRANSCRIPT_READERS[self.hash_name](proof)
        holder = {}

        class _Capture:
            def process(self, f):
                holder["dual"] = f(DualMSM(self.params_ref))
                return holder["dual"]

        cap = _Capture()
        cap.params_ref = self.params
        # each batch item carries ONE proof's instances ([column][row])
        verify_proof(self.params, vk or self.vk, cap, [instances], transcript,
                     multiopen=self.multiopen)
        return holder["dual"]

    def _eval_combined(self, duals, weights, pad_to=None):
        """Device stage: evaluate sum_i w_i * (left_i, right_i).

        pad_to pins the MSM entry count (zero-scalar padding) so every
        bisection subset reuses the one compiled kernel variant for the
        batch — recompiles, not FLOPs, dominate localization cost."""
        left = []
        right = []
        for dual, w in zip(duals, weights):
            for s, b in zip(dual.left.scalars, dual.left.bases):
                left.append((s * w % R, b))
            for s, b in zip(dual.right.scalars, dual.right.bases):
                right.append((s * w % R, b))
        with self.timings.stage("device_msm"):
            # dispatch both MSMs before any sync: jax executes them
            # asynchronously, so the second overlaps the first
            projs = [self._msm_dispatch(e, pad_to) for e in (left, right)]
            points = [_device_point_to_host(p) for p in projs]
        return points[0], points[1]

    def _msm_dispatch(self, entries, pad_to):
        """Enqueue one accumulator MSM on the device; returns a dispatched
        handle (window totals, still async). No host sync happens here."""
        if pad_to is not None and len(entries) < pad_to:
            entries = entries + [(0, None)] * (pad_to - len(entries))
        from ..protocol.kzg import MSMKZG

        m = MSMKZG([s for s, _ in entries], [b for _, b in entries])
        s_arr, x_arr, y_arr = _entries_to_device(m)
        if self.mesh is not None:
            from .mesh import pad_entries, sharded_window_totals

            ndev = self.mesh.devices.size
            s_arr, x_arr, y_arr = pad_entries(s_arr, x_arr, y_arr, ndev)
            return (
                "sharded",
                sharded_window_totals(self.mesh, s_arr, x_arr, y_arr),
            )
        return ("single", msm_jax.msm_window_totals(s_arr, x_arr, y_arr))

    def _pairing_ok(self, left, right) -> bool:
        with self.timings.stage("host_pairing"):
            return hp.pairing_check([
                (left, self.params.s_g2),
                (right, hc.g2_neg(self.params.g2)),
            ])

    # ------------------------------------------------------------- verify
    def verify(self, proofs_and_instances, localize=True) -> BatchResult:
        n = len(proofs_and_instances)
        try:
            duals = self.replay(proofs_and_instances)
        except Exception:
            # a malformed proof: fall back to per-proof replay to identify
            return self._verify_individually(proofs_and_instances)
        weights = [self._rng() for _ in duals]
        # one padded size for the whole batch: all bisection subsets are
        # strictly smaller, so they share this compiled kernel variant
        max_entries = max(
            sum(len(duals[i].left.scalars) for i in range(n)),
            sum(len(duals[i].right.scalars) for i in range(n)),
        )
        pad_to = 1 << max(max_entries - 1, 0).bit_length()
        left, right = self._eval_combined(duals, weights, pad_to)
        if self._pairing_ok(left, right):
            return BatchResult(True, n)
        if not localize:
            return BatchResult(False, n)
        failed = self._bisect(duals, list(range(n)), pad_to)
        return BatchResult(False, n, failed)

    def verify_stream(self, batches, pad_to=None, localize=True):
        """Pipelined verification of a stream of proof batches (the PP axis,
        SURVEY.md §2.3): while the device runs batch k's MSMs, the host
        replays batch k+1's transcripts. One-batch lookahead; yields a
        BatchResult per input batch, in order.

        pad_to pins the MSM size across batches so one kernel variant is
        compiled; defaults to the first batch's padded size (later batches
        must not exceed it — keep batch sizes uniform).
        """
        pending = None  # (batch, duals, pad, left_proj, right_proj)
        for batch in batches:
            try:
                duals = self.replay(batch)
            except Exception:
                if pending is not None:
                    yield self._finish_pipelined(*pending, localize)
                    pending = None
                yield self._verify_individually(batch)
                continue
            n = len(batch)
            max_entries = max(
                sum(len(duals[i].left.scalars) for i in range(n)),
                sum(len(duals[i].right.scalars) for i in range(n)),
            )
            pad = pad_to or (1 << max(max_entries - 1, 0).bit_length())
            weights = [self._rng() for _ in duals]
            left = []
            right = []
            for dual, w in zip(duals, weights):
                for s, b in zip(dual.left.scalars, dual.left.bases):
                    left.append((s * w % R, b))
                for s, b in zip(dual.right.scalars, dual.right.bases):
                    right.append((s * w % R, b))
            with self.timings.stage("device_msm_dispatch"):
                lp = self._msm_dispatch(left, pad)
                rp = self._msm_dispatch(right, pad)
            if pending is not None:
                yield self._finish_pipelined(*pending, localize)
            pending = (batch, duals, pad, lp, rp)
        if pending is not None:
            yield self._finish_pipelined(*pending, localize)

    def _finish_pipelined(self, batch, duals, pad, lp, rp, localize):
        with self.timings.stage("device_msm_collect"):
            left = _device_point_to_host(lp)
            right = _device_point_to_host(rp)
        n = len(batch)
        if self._pairing_ok(left, right):
            return BatchResult(True, n)
        if not localize:
            return BatchResult(False, n)
        return BatchResult(
            False, n, self._bisect(duals, list(range(n)), pad)
        )

    def _bisect(self, duals, indices, pad_to):
        """Localize failing proofs by bisection over already-replayed MSMs
        (log(n) pairings instead of n)."""
        weights = [self._rng() for _ in indices]
        left, right = self._eval_combined(
            [duals[i] for i in indices], weights, pad_to
        )
        if self._pairing_ok(left, right):
            return []
        if len(indices) == 1:
            return indices
        mid = len(indices) // 2
        return self._bisect(duals, indices[:mid], pad_to) + self._bisect(
            duals, indices[mid:], pad_to
        )

    def _verify_individually(self, proofs_and_instances) -> BatchResult:
        from ..protocol.verifier import verify_proof_single

        failed = []
        for i, item in enumerate(proofs_and_instances):
            proof, instances = item[0], item[1]
            vk = item[2] if len(item) > 2 else self.vk
            if not verify_proof_single(self.params, vk, proof,
                                       [instances],
                                       multiopen=self.multiopen,
                                       hash_name=self.hash_name):
                failed.append(i)
        return BatchResult(not failed, len(proofs_and_instances), failed)
