"""Example/test circuits mirroring the reference's workload coverage
(tests/vector_mul.rs, tests/shuffle.rs) plus a lookup circuit the reference
lacks coverage for (SURVEY.md §4 notes that gap).
"""

from __future__ import annotations

from ..ops.constants import R
from .circuit import Assignment, CircuitSpec


def vector_mul_spec(k: int, n_muls: int):
    """Standard PLONK: 3 advice columns, a mul gate gated by a fixed
    (selector) column, copy constraints, one instance column
    (tests/vector_mul.rs:94-127).

    Layout: region A rows [0, n): a values in adv0;
            region B rows [n, 2n): b values in adv0;
            region M rows [2n, 3n): a,b,ab in adv0,adv1,adv2 with s_mul=1;
            instance[i] constrained equal to ab cell i.
    """
    spec = CircuitSpec(k)
    adv = [spec.advice_column(), spec.advice_column(), spec.advice_column()]
    inst = spec.instance_column()
    s_mul = spec.fixed_column()
    for col in adv:
        spec.enable_equality(col)
    spec.enable_equality(inst)

    lhs = spec.query(adv[0], 0)
    rhs = spec.query(adv[1], 0)
    out = spec.query(adv[2], 0)
    sel = spec.query(s_mul, 0)
    spec.gate(sel * (lhs * rhs - out))

    base_m = 2 * n_muls
    for i in range(n_muls):
        spec.assign_fixed(s_mul, base_m + i, 1)
        # copy loaded a/b into the mul region
        spec.copy(adv[0], i, adv[0], base_m + i)
        spec.copy(adv[0], n_muls + i, adv[1], base_m + i)
        # expose the product as public input
        spec.copy(adv[2], base_m + i, inst, i)

    def make_assignment(a_vals, b_vals):
        asg = Assignment(spec)
        products = []
        for i, (a, b) in enumerate(zip(a_vals, b_vals)):
            asg.set_advice(adv[0], i, a)
            asg.set_advice(adv[0], n_muls + i, b)
            asg.set_advice(adv[0], base_m + i, a)
            asg.set_advice(adv[1], base_m + i, b)
            asg.set_advice(adv[2], base_m + i, a * b % R)
            products.append(a * b % R)
        asg.instance = [products]
        return asg

    return spec, make_assignment


def lookup_spec(k: int, table_values, lookups_rows: int):
    """A circuit with a dedicated lookup argument: advice column `a` must
    take values from a fixed table column. Exercises the lookup::Argument
    path the reference never tests."""
    spec = CircuitSpec(k)
    a = spec.advice_column()
    t = spec.fixed_column()
    q = spec.fixed_column()  # lookup gating: q*a in table (q*t)
    qa = spec.query(q, 0) * spec.query(a, 0)
    qt = spec.query(q, 0) * spec.query(t, 0)
    spec.lookup([qa], [qt])

    for i, v in enumerate(table_values):
        spec.assign_fixed(t, i, v)
    for i in range(lookups_rows):
        spec.assign_fixed(q, i, 1)

    def make_assignment(a_vals):
        asg = Assignment(spec)
        for i, v in enumerate(a_vals):
            asg.set_advice(a, i, v)
        asg.instance = []
        return asg

    return spec, make_assignment, a


def shuffle_spec(k: int, width: int, rows: int):
    """Two-phase shuffle circuit in the spirit of tests/shuffle.rs: phase-0
    original columns, phase-1 shuffled columns, an in-circuit challenge, and
    a shuffle argument tying them together."""
    spec = CircuitSpec(k)
    orig = [spec.advice_column(phase=0) for _ in range(width)]
    shuf = [spec.advice_column(phase=1) for _ in range(width)]
    q = spec.fixed_column()
    challenge = spec.challenge(phase=0)

    # the in-circuit challenge scales both sides, exercising challenge
    # variables in compiled expressions (plonk/vk.rs:503-505 challenge range)
    q_e = spec.query(q, 0)
    inputs = [q_e * challenge * spec.query(c, 0) for c in orig]
    shuffles = [q_e * challenge * spec.query(c, 0) for c in shuf]
    spec.shuffle(inputs, shuffles)

    for i in range(rows):
        spec.assign_fixed(q, i, 1)

    def make_assignment(original_cols, permutation):
        """original_cols: [width][rows] values; permutation: row mapping for
        the shuffled copy."""
        asg = Assignment(spec)
        for c in range(width):
            for i in range(rows):
                asg.set_advice(orig[c], i, original_cols[c][i])

        def fill_phase1(challenges):
            for c in range(width):
                for i in range(rows):
                    asg.set_advice(shuf[c], i, original_cols[c][permutation[i]])

        asg.phase_fillers[1] = fill_phase1
        asg.instance = []
        return asg

    return spec, make_assignment
