"""Per-vk traced replay: compile `verify_proof` into a straight-line program.

For a fixed (params, vk, multiopen, hash, instance shape) the verifier's
control flow is completely static — loop counts, transcript read schedule,
rotation-set grouping and query structure all derive from the vk, never from
proof bytes (SURVEY.md §7 "per-vk compiled programs"). This module runs the
UNMODIFIED protocol code (protocol/verifier.py and friends) once over
symbolic scalars, recording every transcript interaction and field operation
into a flat tape. The tape executes per proof either in the native C++ VM
(native/replayvm.cpp — the production path, ~20x faster than CPython) or
nowhere at all: the Python protocol path remains the reference
implementation and fallback.

Correctness notes:
- The only challenge-value-dependent behavior in the protocol is the
  *ordering* of rotation-set points (sorted() in shplonk's
  construct_intermediate_sets, mirroring the reference's BTreeSet,
  shplonk.rs:109-121). Interpolation, vanishing products and r(u) are
  order-independent, so tracing with a deterministic symbol order computes
  the same accumulator. Symbols order by creation index.
- Common-subexpression elimination dedups pure field ops; in particular
  rotate_omega(x, rot) yields ONE symbol per rotation, which is what makes
  symbolic points valid dict/set keys in the grouping code.
- A zero value hitting INV (probability ~2^-254: a challenge collision)
  makes the VM flag the proof invalid, where ff's batch_invert would skip
  it; the reference would then fail the pairing check anyway.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ops.constants import R

# opcodes (must match native/replayvm.cpp)
OP_END = 0
OP_CONST = 1
OP_ADD = 2
OP_SUB = 3
OP_MUL = 4
OP_NEG = 5
OP_INV = 6
OP_SQUEEZE = 7
OP_READ_SCALAR = 8
OP_READ_POINT = 9
OP_ABSORB_REG = 10
OP_AUX_LOAD = 11
OP_BATCH_INV = 12


def _batch_inversions(ops):
    """Group independent OP_INVs into OP_BATCH_INV runs (Montgomery's
    trick in the VM: one Fermat pow + 3(k-1) muls instead of k pows —
    the verifier's inversions are ~6 per proof at ~381 muls each, ~45%
    of its field work).

    Each OP_INV is delayed until just before the first op that consumes
    its output (or another INV whose input is a pending output, or the
    end of the tape); every flush emits the pending INVs as one
    consecutive OP_BATCH_INV group whose FIRST member carries the group
    size in the c field. Pure SSA ops never overwrite registers, so
    inputs stay valid across the delay; stateful ops (squeeze/read/
    absorb) don't write INV outputs' registers either.
    """
    out = []
    pending = []  # [(dst, src)]
    pending_dsts = set()

    def flush():
        if not pending:
            return
        k = len(pending)
        for j, (dst, src) in enumerate(pending):
            out.append((OP_BATCH_INV, dst, src, k if j == 0 else 0))
        pending.clear()
        pending_dsts.clear()

    for op in ops:
        code, a, b, c = op
        if code == OP_INV:
            # the VM hard-caps a BATCH_INV group at 64 members
            # (native/replayvm.cpp OP_BATCH_INV guard) — flush before
            # exceeding it so emitted tapes always satisfy the cap
            if b in pending_dsts or len(pending) >= 64:
                flush()
            pending.append((a, b))
            pending_dsts.add(a)
            continue
        # operand register reads per opcode (a is the dst for value ops;
        # ABSORB_REG reads a)
        reads = ()
        if code in (OP_ADD, OP_SUB, OP_MUL):
            reads = (b, c)
        elif code == OP_NEG:
            reads = (b,)
        elif code == OP_ABSORB_REG:
            reads = (a,)
        if any(r in pending_dsts for r in reads):
            flush()
        out.append(op)
    flush()
    return out


class Sym:
    """A symbolic Fr value = one VM register. Arithmetic emits tape ops
    (with CSE); comparison/hash are by identity so symbols work as the
    dict/set keys the grouping code uses."""

    __slots__ = ("tape", "reg")

    def __init__(self, tape, reg):
        self.tape = tape
        self.reg = reg

    def _coerce(self, other):
        if isinstance(other, Sym):
            return other
        if isinstance(other, int):
            return self.tape.const(other % R)
        return None

    # identity folding matters beyond op count: rotate_omega(x, 0) must
    # yield the SAME symbol as x so that challenge-derived points compare
    # equal as dict/set keys wherever Python compares equal values
    def __add__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        if self.tape.is_const(o, 0):
            return self
        if self.tape.is_const(self, 0):
            return o
        return self.tape.emit(OP_ADD, self.reg, o.reg)

    __radd__ = __add__

    def __mul__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        if self.tape.is_const(o, 1):
            return self
        if self.tape.is_const(self, 1):
            return o
        if self.tape.is_const(o, 0) or self.tape.is_const(self, 0):
            return self.tape.const(0)
        return self.tape.emit(OP_MUL, self.reg, o.reg)

    __rmul__ = __mul__

    def __sub__(self, other):
        o = self._coerce(other)
        if o is None:
            return NotImplemented
        if self.tape.is_const(o, 0):
            return self
        return self.tape.emit(OP_SUB, self.reg, o.reg)

    def __rsub__(self, other):
        o = self._coerce(other)
        return NotImplemented if o is None else self.tape.emit(
            OP_SUB, o.reg, self.reg)

    def __neg__(self):
        return self.tape.emit(OP_NEG, self.reg, 0)

    def __mod__(self, m):
        if m == R:
            return self
        return NotImplemented

    def __pow__(self, e, m=None):
        if m not in (None, R):
            return NotImplemented
        if e == -1:
            return self.tape.emit(OP_INV, self.reg, 0)
        if not isinstance(e, int) or e < 0:
            return NotImplemented
        # square-and-multiply; CSE collapses repeated small powers
        if e == 0:
            return self.tape.const(1)
        result = None
        base = self
        while e:
            if e & 1:
                result = base if result is None else result * base
            e >>= 1
            if e:
                base = base * base
        return result

    def __eq__(self, other):
        return other is self

    def __ne__(self, other):
        return other is not self

    def __hash__(self):
        return id(self)

    def __lt__(self, other):  # deterministic order for sorted()
        return self.reg < other.reg

    def __bool__(self):
        raise TypeError("data-dependent branch on a traced scalar")


class PointSym:
    """Opaque handle for a proof point (transcript read_point result)."""

    __slots__ = ("idx",)

    def __init__(self, idx):
        self.idx = idx


class Tape:
    def __init__(self):
        self.ops = []        # (opcode, a, b, c)
        self.n_regs = 0
        self._consts = {}    # value -> Sym
        self.const_values = []
        self._cse = {}       # (op, a, b) -> Sym
        self.n_points = 0
        self.n_aux = 0
        self.n_reads = 0     # proof bytes consumed = 32 * n_reads

    def _new_reg(self):
        r = self.n_regs
        self.n_regs += 1
        return r

    def is_const(self, s: Sym, v: int) -> bool:
        return self._consts.get(v % R) is s

    def const(self, v: int) -> Sym:
        v %= R
        s = self._consts.get(v)
        if s is None:
            cidx = len(self.const_values)
            self.const_values.append(v)
            reg = self._new_reg()
            self.ops.append((OP_CONST, reg, cidx, 0))
            s = Sym(self, reg)
            self._consts[v] = s
        return s

    def emit(self, op, a, b) -> Sym:
        key = (op, a, b)
        if op in (OP_ADD, OP_MUL) and a > b:
            key = (op, b, a)  # commutative
        s = self._cse.get(key)
        if s is None:
            reg = self._new_reg()
            self.ops.append((op, reg, a, b))
            s = Sym(self, reg)
            self._cse[key] = s
        return s

    # --- stateful (never CSE'd) ---
    def squeeze(self) -> Sym:
        reg = self._new_reg()
        self.ops.append((OP_SQUEEZE, reg, 0, 0))
        return Sym(self, reg)

    def read_scalar(self) -> Sym:
        reg = self._new_reg()
        self.ops.append((OP_READ_SCALAR, reg, 0, 0))
        self.n_reads += 1
        return Sym(self, reg)

    def read_point(self) -> PointSym:
        idx = self.n_points
        self.n_points += 1
        self.ops.append((OP_READ_POINT, idx, 0, 0))
        self.n_reads += 1
        return PointSym(idx)

    def absorb_reg(self, s: Sym) -> None:
        self.ops.append((OP_ABSORB_REG, s.reg, 0, 0))

    def aux_load(self) -> Sym:
        reg = self._new_reg()
        aidx = self.n_aux
        self.n_aux += 1
        self.ops.append((OP_AUX_LOAD, reg, aidx, 0))
        return Sym(self, reg)


class TraceTranscript:
    """Transcript API facade that records the read/squeeze/absorb schedule."""

    def __init__(self, tape: Tape):
        self.tape = tape

    def read_point(self):
        return self.tape.read_point()

    def read_scalar(self):
        return self.tape.read_scalar()

    def read_n_points(self, n):
        return [self.read_point() for _ in range(n)]

    def read_n_scalars(self, n):
        return [self.read_scalar() for _ in range(n)]

    def squeeze_challenge(self):
        return self.tape.squeeze()

    def common_scalar(self, value):
        if isinstance(value, int):
            value = self.tape.const(value)
        self.tape.absorb_reg(value)


@dataclass
class ReplayProgram:
    """A compiled replay: ops + constants + output layout.

    left/right entries: (scalar_out_index, base) where base is
    ('pt', point_index) for proof points or ('const', (x, y)) for
    vk/params points known at compile time.
    """

    ops: np.ndarray          # (n_ops, 4) uint32
    const_bytes: bytes       # n_consts * 32B canonical LE
    n_regs: int
    n_points: int
    n_aux: int
    min_proof_len: int
    hash_name: str
    out_regs: list           # registers exported as canonical scalars
    left_entries: list
    right_entries: list
    instance_shape: tuple
    # static proof byte offset of each compressed point, indexed by point
    # idx (the transcript read schedule is vk-static, every read is 32B) —
    # lets the host gather x-coordinates for device-side decompression
    point_offsets: list = field(default_factory=list)

    def serialize(self) -> bytes:
        """Flat buffer for the native VM: header + out_regs + ops + consts
        (layout mirrored in native/replayvm.cpp)."""
        header = np.array(
            [
                self.ops.shape[0],
                self.n_regs,
                self.n_points,
                self.n_aux,
                len(self.const_bytes) // 32,
                len(self.out_regs),
                0 if self.hash_name == "blake2b" else 1,
                self.min_proof_len,
            ],
            dtype=np.uint32,
        )
        out = np.asarray(self.out_regs, dtype=np.uint32)
        return (
            header.tobytes()
            + out.tobytes()
            + np.ascontiguousarray(self.ops, dtype=np.uint32).tobytes()
            + self.const_bytes
        )


def trace_verify(params, vk, instance_shape, multiopen="shplonk",
                 hash_name="blake2b") -> ReplayProgram:
    """Run verify_proof once over symbols; return the compiled program.

    instance_shape: tuple of per-column row counts for ONE proof.
    """
    from .kzg import DualMSM
    from .verifier import verify_proof

    tape = Tape()
    transcript = TraceTranscript(tape)
    instances = [[tape.aux_load() for _ in range(rows)]
                 for rows in instance_shape]

    holder = {}

    class _Capture:
        def process(self, f):
            holder["dual"] = f(DualMSM(params))
            return holder["dual"]

    verify_proof(params, vk, _Capture(), [instances], transcript,
                 multiopen=multiopen)
    dual = holder["dual"]

    out_regs = []
    out_index = {}

    def scalar_out(s):
        if isinstance(s, int):
            s = tape.const(s)
        if s.reg not in out_index:
            out_index[s.reg] = len(out_regs)
            out_regs.append(s.reg)
        return out_index[s.reg]

    def base_ref(b):
        if isinstance(b, PointSym):
            return ("pt", b.idx)
        return ("const", b)

    left_entries = [(scalar_out(s), base_ref(b))
                    for s, b in zip(dual.left.scalars, dual.left.bases)]
    right_entries = [(scalar_out(s), base_ref(b))
                     for s, b in zip(dual.right.scalars, dual.right.bases)]

    batched = _batch_inversions(tape.ops)
    ops = np.asarray(batched + [(OP_END, 0, 0, 0)], dtype=np.uint32)
    const_bytes = b"".join(v.to_bytes(32, "little")
                           for v in tape.const_values)
    point_offsets = [0] * tape.n_points
    cursor = 0
    for code, a, _b, _c in tape.ops:
        if code == OP_READ_SCALAR:
            cursor += 32
        elif code == OP_READ_POINT:
            point_offsets[a] = cursor
            cursor += 32
    return ReplayProgram(
        ops=ops,
        const_bytes=const_bytes,
        n_regs=tape.n_regs,
        n_points=tape.n_points,
        n_aux=tape.n_aux,
        min_proof_len=32 * tape.n_reads,
        hash_name=hash_name,
        out_regs=out_regs,
        left_entries=left_entries,
        right_entries=right_entries,
        instance_shape=tuple(instance_shape),
        point_offsets=point_offsets,
    )
