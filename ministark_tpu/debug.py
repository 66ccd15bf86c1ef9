"""Constraint debugging: a REAL per-row trace validator.

The reference ships an empty stub here (src/debug.rs:17-127, all
commented out); this implements what that dead code intended: evaluate every
constraint on every trace row with 0/0-tolerant division and report the
first (constraint, row) that fails.  Rows are subsampled beyond
`MAX_FULL_ROWS` to keep debug proving fast.
"""

from __future__ import annotations

from .constraints import Constraint
from .expression import Challenge, Constant, Hint, Periodic, Trace, X
from .fields.scalar import Fp, P

MAX_FULL_ROWS = 1 << 12


class ConstraintViolation(Exception):
    pass


def validate_constraints(air, challenges, hints, base_trace, extension_trace):
    n = base_trace.num_rows
    trace_dom = air.trace_domain()

    base_vals = base_trace.to_ints()  # (ncols, n) numpy uint64
    ext_rows = None
    if extension_trace is not None:
        ext_rows = extension_trace  # row access below

    if n <= MAX_FULL_ROWS:
        rows = range(n)
    else:
        import random as _random
        rng = _random.Random(0)
        rows = sorted({0, 1, n - 2, n - 1} | {rng.randrange(n) for _ in range(252)})

    nb = base_trace.num_cols
    for ci, constraint in enumerate(air.constraints):
        for row in rows:
            x = trace_dom.element(row)

            def leaf_value(leaf):
                if isinstance(leaf, X):
                    return x
                if isinstance(leaf, Constant):
                    return leaf.value
                if isinstance(leaf, Challenge):
                    return challenges[leaf.index]
                if isinstance(leaf, Hint):
                    return hints[leaf.index]
                if isinstance(leaf, Trace):
                    r = (row + leaf.offset) % n
                    if leaf.column < nb:
                        return Fp(int(base_vals[leaf.column, r]))
                    return ext_rows.get_row(r)[leaf.column - nb]
                if isinstance(leaf, Periodic):
                    point = x ** (n // leaf.interval_size)
                    acc = type(point).zero()
                    for c in reversed(leaf.coeffs):
                        acc = acc * point + c
                    return acc
                raise TypeError(leaf)

            result = constraint.check(leaf_value)
            if result is not None and not result.is_zero():
                raise ConstraintViolation(
                    f"constraint {ci} does not evaluate to zero at row {row} "
                    f"(got {result})")
