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

import threading

import jax
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


def _dedup_entries(entries):
    """Merge MSM entries sharing a base point: sum their scalars mod R.
    First-appearance order; identity-base (None) entries merge too."""
    idx = {}
    out = []
    for s, b in entries:
        j = idx.get(b)
        if j is None:
            idx[b] = len(out)
            out.append([s % R, b])
        else:
            out[j][0] = (out[j][0] + s) % R
    return [(s, b) for s, b in out]


@dataclass
class BatchResult:
    ok: bool
    num_proofs: int
    failed_indices: list = field(default_factory=list)


class BatchVerifier:
    """Verify many proofs with one deferred pairing, device MSMs, and
    optional mesh sharding."""

    def __init__(self, params, vk, multiopen="shplonk", hash_name="blake2b",
                 mesh=None, rng=None, strategy="accumulator",
                 pairing="host"):
        if strategy not in ("accumulator", "single"):
            raise ValueError(f"unknown strategy {strategy!r} "
                             "(expected 'accumulator' or 'single')")
        from ..protocol.kzg import pairing_backend

        # "host" = native C++ Miller loop (one ~15 ms pairing per batch —
        # the accumulator default); "device" = ops/pairing_jax lane-packed
        # tower, which keeps SingleStrategy verification fully
        # on-accelerator and batches per-proof pairings across lanes
        self.pairing = pairing
        self._pairing_fn = pairing_backend(pairing)
        self.params = params
        self.vk = vk
        self.multiopen = multiopen
        self.hash_name = hash_name
        self.mesh = mesh
        # "single" = SingleStrategy semantics (kzg/strategy.rs:164-177):
        # each proof is checked immediately with its own pairing, failures
        # identified exactly; "accumulator" defers one pairing per batch
        # (kzg/strategy.rs:125-141)
        self.strategy = strategy
        if rng is not None:
            self._rng = rng
        elif self._mesh_spans_processes():
            # SPMD multi-process mesh: every process replays the same
            # proofs and must fold IDENTICAL isolation weights, or the
            # assembled global MSM is inconsistent and valid batches get
            # spuriously rejected. Coordinate a seed from process 0 and
            # drive a deterministic PRNG from it (weights stay
            # unpredictable to a prover: the seed is fresh entropy).
            import random

            from jax.experimental import multihost_utils

            seed = int(multihost_utils.broadcast_one_to_all(
                np.asarray(secrets.randbits(63), dtype=np.int64)
            ))
            prng = random.Random(seed)
            self._rng = lambda: 1 + prng.randrange(R - 1)
        else:
            self._rng = lambda: 1 + secrets.randbelow(R - 1)
        # localization (replay/_bisect share CompiledReplay programs) and
        # multi-process collects (collective order must be pinned) are
        # serialized across the stream pipeline's finish workers
        self._finish_lock = threading.Lock()
        self.timings = StageTimings()
        # cumulative MSM work counter (for points/s metrics): entries
        # actually dispatched to the device, including shape padding
        self.msm_entries_dispatched = 0
        self.point_adds_dispatched = 0

    def _mesh_spans_processes(self) -> bool:
        if self.mesh is None:
            return False
        try:
            me = jax.process_index()
            return any(d.process_index != me
                       for d in self.mesh.devices.flat)
        except Exception:
            return False

    # ------------------------------------------------------------ replay
    def replay(self, proofs_and_instances):
        """Host stage: replay every proof's transcript; returns the list of
        per-proof DualMSMs (unevaluated) or raises on malformed proofs.

        Items are (proof, instances) pairs, or (proof, instances, vk)
        triples for heterogeneous-circuit batches (BASELINE config 4: the
        accumulated DualMSMs are vk-independent, so proofs of different
        circuits still share the device MSMs and the single pairing).

        Fast path: per-vk traced programs on the native VM
        (protocol/trace.py + native/replayvm.cpp), ~6x the Python replay
        and threaded across proofs; Python remains the reference fallback.
        MalformedProof propagates like the Python replay's parse errors."""
        fast = self._replay_vm_batch(proofs_and_instances)
        if fast is not None:
            return fast
        duals = []
        for item in proofs_and_instances:
            with self.timings.stage("host_replay"):
                duals.append(self._replay_one(*item))
        return duals

    def _replay_vm_batch(self, items):
        """Native-VM replay of the whole batch, grouped by (vk, instance
        shape) programs. Returns None when the VM is unavailable (pure-
        Python environments) or a program fails to trace."""
        import os

        if os.environ.get("H2V_DISABLE_VM"):
            return None
        from ..protocol.replay_native import (
            CompiledReplay,
            MalformedProof,
            vm_available,
        )

        if not vm_available():
            return None
        if not hasattr(self, "_vm_programs"):
            self._vm_programs = {}
        groups = {}  # key -> (compiled, [(orig_idx, proof, instances)])
        with self.timings.stage("host_replay"):
            try:
                for i, item in enumerate(items):
                    proof, instances = item[0], item[1]
                    vk = item[2] if len(item) > 2 else self.vk
                    shape = tuple(len(c) for c in instances)
                    key = (vk.content_digest(), shape)
                    if key not in self._vm_programs:
                        self._vm_programs[key] = CompiledReplay(
                            self.params, vk, shape,
                            multiopen=self.multiopen,
                            hash_name=self.hash_name,
                        )
                    groups.setdefault(key, []).append((i, proof, instances))
                duals = [None] * len(items)
                for key, members in groups.items():
                    out = self._vm_programs[key].replay_batch(
                        [(p, inst) for _, p, inst in members]
                    )
                    for (i, _, _), d in zip(members, out):
                        duals[i] = d
                return duals
            except MalformedProof:
                raise
            except Exception:
                # tracing/VM edge: stay correct on the Python path
                return None

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
            handle = self._msm_dispatch_pair(left, right, pads=pad_to)
            points = self._collect_pair(handle)
        return points[0], points[1]

    # padded sizes quantize to this granularity: one compiled kernel per
    # size class, without the up-to-2x work of power-of-two padding
    PAD_GRAN = 256

    def _msm_dispatch_pair(self, left, right, pads=None):
        """Enqueue BOTH accumulator MSMs as one grouped device dispatch
        (ops/msm_jax grouped path): one upload set, one kernel, and later
        one fetch — host<->device round trips, not FLOPs, dominate at
        batch-size MSMs. Returns an async handle; no host sync here.

        pads: per-side padded entry counts — None (quantize each side to
        PAD_GRAN), an int (both sides, as the bisection path does to reuse
        one compiled shape across subsets), or a (pad_left, pad_right)
        tuple."""
        # vk-shared bases (fixed/sigma commitments, the g1 generator) repeat
        # across every proof in the batch: summing their scalars on the host
        # collapses ~1/3 of the entries before any device work
        left = _dedup_entries(left)
        right = _dedup_entries(right)
        if pads is None:
            pads = tuple(
                max(-(-len(e) // self.PAD_GRAN) * self.PAD_GRAN,
                    self.PAD_GRAN)
                for e in (left, right)
            )
        elif isinstance(pads, int):
            pads = (pads, pads)
        groups = []
        for entries, pad in zip((left, right), pads):
            assert len(entries) <= pad
            groups.append(entries + [(0, None)] * (pad - len(entries)))
        ss, xs, ys = [], [], []
        for entries in groups:
            for s, pt in entries:
                ss.append(s % R)
                if pt is None:
                    xs.append(0)
                    ys.append(0)
                else:
                    xs.append(pt[0])
                    ys.append(pt[1])
        s_np = ints_to_limbs(ss)
        x_np = ints_to_limbs(xs)
        y_np = ints_to_limbs(ys)
        return self._dispatch_limbs(s_np, x_np, y_np,
                                    [len(g) for g in groups])

    def _dispatch_limbs(self, s_np, x_np, y_np, sizes):
        """Dispatch the grouped MSM from canonical limb arrays (scalars and
        affine coords, concatenated per group). Returns the async handle.

        Single-chip dispatch uses the host-planned addition-forest MSM
        (ops/msm_forest.py, ~levels-x fewer point adds than the segmented
        scan); H2V_MSM=scan reverts to the scan path. The mesh-sharded
        path stays on the presorted scan (its per-chip slices re-plan
        locally)."""
        import os

        self.msm_entries_dispatched += s_np.shape[0]
        mode = os.environ.get("H2V_MSM", "forest")
        if mode == "host":
            # exact host MSM (native C++ Pippenger), zero XLA compiles —
            # for orchestration-logic tests and tiny batches where kernel
            # compile time dwarfs the arithmetic
            from ..ops.limbs import limbs_to_ints

            ss = limbs_to_ints(s_np)
            xs = limbs_to_ints(x_np)
            ys = limbs_to_ints(y_np)
            out, off = [], 0
            for size in sizes:
                sl = slice(off, off + size)
                pts = [
                    (x, y) if (x or y) else None
                    for x, y in zip(xs[sl], ys[sl])
                ]
                pairs = [(s, p) for s, p in zip(ss[sl], pts)
                         if p is not None]
                out.append(hc.g1_msm([s for s, _ in pairs],
                                     [p for _, p in pairs])
                           if pairs else None)
                off += size
            return ("host", out)
        forest = mode == "forest"
        if self.mesh is None and forest:
            from ..ops import msm_forest

            plan = msm_forest.host_plan(s_np, sizes)
            # pin the level/part-width signature per workload: random
            # weights drift digit counts across quantization boundaries
            # batch to batch, and an unpinned width flip retraces stage
            # programs MID-STREAM (msm_forest.pin_plan_widths; measured
            # ~13 s/batch on the keccak bench extra before pinning).
            # Pins persist next to the AOT pack so warm starts begin at
            # the recorded shapes (utils/aotcache.load_plan_pins).
            from ..utils import aotcache

            if not hasattr(self, "_plan_pins"):
                self._plan_pins = aotcache.load_plan_pins()
            pin_key = repr(tuple(sizes))
            old_pin = self._plan_pins.get(pin_key)
            plan, new_pin = msm_forest.pin_plan_widths(plan, old_pin)
            if new_pin != old_pin:
                self._plan_pins[pin_key] = new_pin
                aotcache.save_plan_pins(self._plan_pins)
            # device point-add count for speed-of-light accounting: forest
            # levels (plan) + per-window bit-plane bucket reduction
            # (7-level tree over 128 buckets x 8 bit planes + 14-step
            # Horner, see msm_forest._bucket_phase)
            self.point_adds_dispatched += plan["adds"] + (
                len(sizes) * msm_jax.NUM_WINDOWS * (127 * 8 + 14)
            )
            mode = self._forest_mode()
            if mode == "fused":
                arr = msm_forest.dispatch_planned_fused(x_np, y_np, plan)
            elif mode == "fuse3":
                arr = msm_forest.dispatch_planned_fuse3(x_np, y_np, plan)
            else:
                arr = msm_forest.dispatch_planned(x_np, y_np, plan)
            return ("grouped", self._prefetch_d2h(arr))
        if self.mesh is not None and forest:
            D = self.mesh.devices.size
            # H2V_MESH_SHARD=windows|forest|scan forces a specific sharded
            # dispatch kind (tests exercise each; production auto-selects:
            # windows when D divides NUM_WINDOWS, else point-sharded
            # forest, else the presorted scan)
            pref = os.environ.get("H2V_MESH_SHARD")
            if (pref in (None, "windows")
                    and msm_jax.NUM_WINDOWS % D == 0):
                # preferred: window sharding — no collective, per-chip
                # work (forest + bucket phase) all scales 1/D
                from .mesh import sharded_forest_by_windows

                self.mesh_wire_stats = {}
                arr = sharded_forest_by_windows(
                    self.mesh, x_np, y_np, s_np, sizes,
                    stats=self.mesh_wire_stats,
                )
                return ("sharded_windows", self._prefetch_d2h(arr))
            if (pref in (None, "forest")
                    and (len(sizes) * msm_jax.NUM_WINDOWS) % D == 0):
                # fallback for D > NUM_WINDOWS or huge point tables:
                # point sharding + all_to_all bucket exchange
                from .mesh import sharded_forest_window_totals

                self.mesh_wire_stats = {}
                arr = sharded_forest_window_totals(
                    self.mesh, x_np, y_np, s_np, sizes,
                    stats=self.mesh_wire_stats,
                )
                return ("sharded_forest", self._prefetch_d2h(arr))
        idx_sorted, keys_sorted, levels = msm_jax.host_plan(s_np, sizes)
        if self.mesh is not None:
            from .mesh import sharded_window_totals_presorted

            ndev = self.mesh.devices.size
            m = idx_sorted.shape[0]
            rem = (-m) % ndev
            if rem:
                # pad with identity-point entries in the last segment: the
                # complete add absorbs identities, the repeated key keeps
                # the order sorted
                x_np = np.concatenate(
                    [x_np, np.zeros((1, x_np.shape[1]), x_np.dtype)]
                )
                y_np = np.concatenate(
                    [y_np, np.zeros((1, y_np.shape[1]), y_np.dtype)]
                )
                idx_sorted = np.concatenate([
                    idx_sorted,
                    np.full(rem, x_np.shape[0] - 1, idx_sorted.dtype),
                ])
                keys_sorted = np.concatenate([
                    keys_sorted,
                    np.full(rem, keys_sorted[-1], keys_sorted.dtype),
                ])
            arr = sharded_window_totals_presorted(
                self.mesh, x_np, y_np, idx_sorted, keys_sorted,
                total_windows=2 * msm_jax.NUM_WINDOWS, levels=levels,
            )
            return ("sharded_grouped", self._prefetch_d2h(arr))
        arr = msm_jax.msm_window_totals_grouped(
            x_np, y_np, idx_sorted, keys_sorted, groups=2, levels=levels
        )
        return ("grouped", self._prefetch_d2h(arr))

    def _forest_mode(self) -> str:
        """Forest dispatch granularity (benchmarks/RESULTS.md r05 A/B):

        - "flat"  — one program per stage (~25 launches): best
          steady-state (XLA overlaps the program chain; ~224 ms
          device/batch at bench shapes) but ~430 s of cold compiles.
        - "fuse3" — 3 levels + their finished-part gathers per program
          (6 launches): 2.2x faster cold compile, ~30% slower steady
          (~297 ms).
        - "fused" — everything in one program: slowest steady (no
          overlap), kept as an experiment switch.

        Policy: env overrides (H2V_FOREST_FLAT/FUSE3/FUSED=1) win; CPU
        (tests) uses flat (fused programs compile for minutes on 2
        vCPUs and the small per-stage programs hit the persistent
        compile cache); an accelerator uses fuse3. Flat's steady edge
        only exists for TRACED programs: served from the AOT pack its
        ~25 Compiled.call python dispatches per batch measured 2.4-2.6k
        proofs/s vs fuse3's 4.2k (jit's C++ cache-hit dispatch is what
        made the 25-launch chain cheap), so with the pack fuse3 wins
        BOTH warmup (8.6 s) and steady state."""
        mode = getattr(self, "_forest_mode_cache", None)
        if mode is None:
            import os

            import jax

            if os.environ.get("H2V_FOREST_FUSED") == "1":
                mode = "fused"
            elif os.environ.get("H2V_FOREST_FLAT") == "1":
                mode = "flat"
            elif os.environ.get("H2V_FOREST_FUSE3") == "1":
                mode = "fuse3"
            elif jax.default_backend() == "cpu":
                mode = "flat"
            else:
                mode = "fuse3"
            self._forest_mode_cache = mode
        return mode

    @staticmethod
    def _prefetch_d2h(arr):
        """Enqueue the device->host copy of a window-totals array right at
        dispatch time: the runtime transfers as soon as the kernels
        finish, so the later collect's np.asarray finds the host copy
        ready instead of paying the fetch RTT after the sync (~28 ms per
        batch over the tunneled chip, benchmarks/prof_forest_path.py
        r04). H2V_D2H_PREFETCH=0 disables (A/B harness)."""
        import os

        if os.environ.get("H2V_D2H_PREFETCH") == "0":
            return arr
        try:
            arr.copy_to_host_async()
        except Exception:
            # best-effort optimization: backends without the method
            # (AttributeError) or that reject it on non-fully-addressable
            # multi-process arrays degrade to a plain fetch at collect
            pass
        return arr

    def _decomp_enabled(self) -> bool:
        """Device G1-decompression pre-pass (ops/decomp_jax.py): on by
        default on an accelerator (H2V_DECOMP=host/device overrides); the
        mesh path keeps host decompression (its device queue is the
        sharded MSM)."""
        import os

        v = os.environ.get("H2V_DECOMP")
        if v == "device":
            return True
        if v == "host":
            return False
        if self.mesh is not None:
            return False
        import jax

        return jax.default_backend() != "cpu"

    def _stream_groups(self, batch):
        """Group a stream batch's indices by (vk, instance shape) and
        compile/lookup the VM program for each — heterogeneous-vk batches
        (BASELINE config 4) ride the same raw fast path as homogeneous
        ones, their per-group entry arrays concatenating into the shared
        accumulator MSMs. Returns [(program, idxs)] in first-appearance
        order (stable across uniform stream batches, so the pinned pad
        sizes stay valid), or None when the fast path doesn't apply."""
        import os

        if os.environ.get("H2V_DISABLE_VM"):
            return None
        from ..protocol.replay_native import CompiledReplay, vm_available

        if not vm_available():
            return None
        if not hasattr(self, "_vm_programs"):
            self._vm_programs = {}
        groups = {}
        order = []
        for i, item in enumerate(batch):
            vk = item[2] if len(item) > 2 else self.vk
            shape = tuple(len(c) for c in item[1])
            key = (vk.content_digest(), shape)
            if key not in self._vm_programs:
                try:
                    self._vm_programs[key] = CompiledReplay(
                        self.params, vk, shape, multiopen=self.multiopen,
                        hash_name=self.hash_name,
                    )
                except Exception:
                    return None
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(i)
        return [(self._vm_programs[k], groups[k]) for k in order]

    def _prefetch_decomp(self, batch, executor):
        """Dispatch the device sqrt pre-pass for a batch (one dispatch per
        vk group) and hand the fetch+pack to a worker thread; returns a
        list of per-group Futures of ext_y bytes (None entries where the
        pre-pass doesn't apply). Called one batch AHEAD in verify_stream
        so the device round trip overlaps the previous batch's host
        work."""
        if not self._decomp_enabled():
            return None
        groups = self._stream_groups(batch)
        if groups is None:
            return None
        from ..ops import decomp_jax
        from ..protocol.replay_native import CompiledReplay

        futs = []
        for program, idxs in groups:
            if not program.n_points:
                futs.append(None)
                continue
            xs = program.gather_point_xs([batch[i][0] for i in idxs])
            handle = decomp_jax.dispatch_y_batch(xs)
            futs.append(executor.submit(
                lambda h=handle, m=xs.shape[0]:
                CompiledReplay.pack_ext_y(np.asarray(h), m)
            ))
        return futs

    def _fast_stream_dispatch(self, batch, pads, ext_y_futs=None):
        """VM raw fast path for a stream batch: replay with the per-proof
        isolation weights folded in-VM (per vk group), assemble the two
        accumulator MSMs as numpy limb arrays (no per-entry Python big
        ints), dispatch. Returns (handle, pads) or None when inapplicable
        (VM unavailable / a program fails to trace). MalformedProof
        propagates.

        ext_y_futs: optional per-group Futures of device-decompressed
        principal roots (from _prefetch_decomp) — the VM then verifies
        instead of computing each point's sqrt."""
        groups = self._stream_groups(batch)
        if groups is None:
            return None
        try:
            weights = [self._rng() for _ in batch]
            sides = {"left": [], "right": []}
            for gi, (program, idxs) in enumerate(groups):
                sub = [(batch[i][0], batch[i][1]) for i in idxs]
                w = [weights[i] for i in idxs]
                ext_y = None
                if ext_y_futs is not None and ext_y_futs[gi] is not None:
                    ext_y = ext_y_futs[gi].result()
                with self.timings.stage("host_replay"):
                    sc, pt = program.replay_batch_raw(sub, w, ext_y=ext_y)
                with self.timings.stage("host_assemble"):
                    garrs = program.batch_msm_arrays(sc, pt, len(sub))
                for side in sides:
                    sides[side].append(garrs[side])
            arrs = {
                side: tuple(np.concatenate([g[c] for g in parts])
                            for c in range(3))
                for side, parts in sides.items()
            }
        except VerifyFailure:
            raise
        except Exception:
            return None
        if pads is None:
            pads = tuple(
                max(-(-arrs[s][0].shape[0] // self.PAD_GRAN)
                    * self.PAD_GRAN, self.PAD_GRAN)
                for s in ("left", "right")
            )
        parts = {"s": [], "x": [], "y": []}
        sizes = []
        for side, pad in zip(("left", "right"), pads):
            S, X, Y = arrs[side]
            m = S.shape[0]
            assert m <= pad, "stream batch grew past the pinned pad size"
            if m < pad:
                z = np.zeros((pad - m, S.shape[1]), dtype=S.dtype)
                S, X, Y = (np.concatenate([a, z]) for a in (S, X, Y))
            parts["s"].append(S)
            parts["x"].append(X)
            parts["y"].append(Y)
            sizes.append(pad)
        with self.timings.stage("device_msm_dispatch"):
            handle = self._dispatch_limbs(
                np.concatenate(parts["s"]),
                np.concatenate(parts["x"]),
                np.concatenate(parts["y"]),
                sizes,
            )
        return handle, pads

    def _collect_pair(self, handle):
        """Synchronize a dispatched MSM pair: one fetch, exact host fold."""
        kind, arr = handle
        if kind == "host":
            return arr
        if kind == "sharded_grouped":
            from .mesh import combine_sharded_grouped

            return combine_sharded_grouped(arr, 2)
        if kind == "sharded_forest":
            from .mesh import combine_sharded_forest

            return combine_sharded_forest(arr, 2)
        if kind == "sharded_windows":
            from .mesh import combine_sharded_windows

            return combine_sharded_windows(arr, 2)
        return msm_jax.combine_window_totals_grouped(arr, 2)

    def _pairing_ok(self, left, right) -> bool:
        with self.timings.stage("host_pairing"):
            return self._pairing_fn([
                (left, self.params.s_g2),
                (right, hc.g2_neg(self.params.g2)),
            ])

    # ------------------------------------------------------------- verify
    def verify(self, proofs_and_instances, localize=True) -> BatchResult:
        if self.strategy == "single":
            return self._verify_individually(proofs_and_instances)
        n = len(proofs_and_instances)
        try:
            duals = self.replay(proofs_and_instances)
        except Exception:
            # a malformed proof: fall back to per-proof replay to identify
            return self._verify_individually(proofs_and_instances)
        weights = [self._rng() for _ in duals]
        # main check: tight per-side padding (PAD_GRAN classes)
        left, right = self._eval_combined(duals, weights)
        if self._pairing_ok(left, right):
            return BatchResult(True, n)
        if not localize:
            return BatchResult(False, n)
        # localization: one padded size for all bisection subsets — every
        # subset is smaller than the batch, so they share ONE compiled
        # kernel variant (recompiles, not FLOPs, dominate bisection cost)
        max_entries = max(
            sum(len(duals[i].left.scalars) for i in range(n)),
            sum(len(duals[i].right.scalars) for i in range(n)),
        )
        pad_to = -(-max_entries // self.PAD_GRAN) * self.PAD_GRAN
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
        if self.strategy == "single":
            # SingleStrategy: immediate per-proof pairing, no deferral —
            # the pipeline (whose whole point is one deferred pairing per
            # batch) degenerates to sequential per-proof verification
            for batch in batches:
                yield self._verify_individually(batch)
            return
        import os
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # finish (device sync + fetch + pairing) runs on worker threads so
        # it overlaps the NEXT batch's replay — both sides release the GIL
        # (native VM call; device transfer; native pairing). TWO workers /
        # two batches in flight: batch k's pairing (~14 ms) overlaps batch
        # k+1's device wait instead of serializing after it on one worker
        # (prof_forest_path r04: the finish thread is the critical path).
        depth = max(1, int(os.environ.get("H2V_STREAM_DEPTH", "2")))
        if self._mesh_spans_processes():
            # multi-process collects run collectives (process_allgather)
            # whose cross-process ORDER must match; two finish workers
            # could issue them interleaved and deadlock — keep one
            depth = 1
        executor = ThreadPoolExecutor(max_workers=depth)
        # decomp fetches get their own worker: the y-array transfer for
        # batch k+1 overlaps batch k's replay/dispatch on the main thread
        decomp_executor = ThreadPoolExecutor(max_workers=1)
        pending = deque()  # FIFO of Future[BatchResult]; dispatch runs up
        # to depth+1 ahead of the consumer (the drain below trims to depth
        # AFTER appending) — intended: the extra slot keeps the device fed
        # while the oldest batch's result is being yielded
        stream_pads = (pad_to, pad_to) if pad_to is not None else None

        def batches_with_decomp():
            """One-batch lookahead: the device sqrt pre-pass for batch k+1
            is dispatched before batch k is processed, hiding its round
            trip behind host work."""
            it = iter(batches)
            cur = next(it, None)
            if cur is None:
                return
            cur_y = self._prefetch_decomp(cur, decomp_executor)
            while cur is not None:
                nxt = next(it, None)
                nxt_y = (self._prefetch_decomp(nxt, decomp_executor)
                         if nxt is not None else None)
                yield cur, cur_y
                cur, cur_y = nxt, nxt_y

        try:
            for batch, ext_y_fut in batches_with_decomp():
                # fast path: VM replay with in-VM weight folding, numpy MSM
                # assembly — no per-proof Python accumulators unless a
                # failure later needs localization
                try:
                    fast = self._fast_stream_dispatch(batch, stream_pads,
                                                      ext_y_fut)
                except VerifyFailure:
                    while pending:
                        yield pending.popleft().result()
                    yield self._verify_individually(batch)
                    continue
                if fast is not None:
                    handle, pads = fast
                    stream_pads = stream_pads or pads
                    pending.append(executor.submit(
                        self._finish_pipelined, batch, None,
                        max(stream_pads), handle, localize,
                    ))
                    while len(pending) > depth:
                        yield pending.popleft().result()
                    continue
                try:
                    duals = self.replay(batch)
                except Exception:
                    while pending:
                        yield pending.popleft().result()
                    yield self._verify_individually(batch)
                    continue
                weights = [self._rng() for _ in duals]
                left = []
                right = []
                for dual, w in zip(duals, weights):
                    for s, b in zip(dual.left.scalars, dual.left.bases):
                        left.append((s * w % R, b))
                    for s, b in zip(dual.right.scalars, dual.right.bases):
                        right.append((s * w % R, b))
                if stream_pads is None:
                    # pin the first batch's per-side padded shape across
                    # the stream: later batches reuse the compiled kernel —
                    # keep batch sizes uniform
                    stream_pads = tuple(
                        max(-(-len(e) // self.PAD_GRAN) * self.PAD_GRAN,
                            self.PAD_GRAN)
                        for e in (left, right)
                    )
                with self.timings.stage("device_msm_dispatch"):
                    handle = self._msm_dispatch_pair(left, right,
                                                     stream_pads)
                pending.append(executor.submit(
                    self._finish_pipelined, batch, duals,
                    max(stream_pads), handle, localize,
                ))
                while len(pending) > depth:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()
        finally:
            executor.shutdown(wait=True)
            decomp_executor.shutdown(wait=True)

    def _finish_pipelined(self, batch, duals, pad, handle, localize):
        with self.timings.stage("device_msm_collect"):
            left, right = self._collect_pair(handle)
        n = len(batch)
        if self._pairing_ok(left, right):
            return BatchResult(True, n)
        if not localize:
            return BatchResult(False, n)
        # two finish workers may hit this path concurrently; replay/_bisect
        # share the per-vk CompiledReplay programs (not thread-safe), so
        # the rare localization branch is serialized
        with self._finish_lock:
            if duals is None:
                # fast path keeps no per-proof accumulators; localization
                # is the rare branch, so replay once more for the bisection
                duals = self.replay(batch)
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
                                       hash_name=self.hash_name,
                                       pairing=self.pairing):
                failed.append(i)
        return BatchResult(not failed, len(proofs_and_instances), failed)
