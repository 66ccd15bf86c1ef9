"""Constraint-layer tests (pattern: tests/constraint.rs in the reference):
degree bookkeeping, CSE, composition building, and symbolic-vs-naive
evaluation of constraints over an LDE."""

import numpy as np
import pytest

from ministark_tpu import eval as ev
from ministark_tpu.air import Air, ProofOptions, compose_constraints
from ministark_tpu.constraints import (
    Constraint,
    challenge,
    constant,
    curr,
    next,
    x,
)
from ministark_tpu.expression import CompositionCoeff, Expr
from ministark_tpu.fields import Fp, P, GENERATOR
from ministark_tpu.fields import device as fd
from ministark_tpu.models.fib import FibAirConfig
from ministark_tpu.ntt import Domain


def test_degree_bookkeeping():
    n = 2048
    # transition-style: (c0*c1 - c2_next) * (x - a) / (x^n - 1)
    expr = (curr(0) * curr(1) - next(2)) * (x() - constant(Fp(3))) / (
        x().pow(n) - constant(Fp(1)))
    c = Constraint(expr)
    num, den = c.degree(n - 1)
    assert num - den == 2 * (n - 1) + 1 - n
    assert c.blowup_factor(n) == 1

    # high-degree: trace^4 -> blowup 4
    c4 = Constraint(curr(0) * curr(0) * curr(0) * curr(0))
    assert c4.blowup_factor(n) == 4


def test_trace_arguments_sorted():
    c = Constraint(next(3) + curr(1) * trace_off(1, -1))
    assert sorted(c.trace_arguments()) == [(1, -1), (1, 0), (3, 1)]


def trace_off(col, off):
    from ministark_tpu.constraints import trace_offset
    return trace_offset(col, off)


def test_cse_shares_nodes():
    a = curr(0) * curr(1)
    e = (a + constant(Fp(1))) * (curr(0) * curr(1) + constant(Fp(2)))
    before = e.num_nodes()
    after = e.cse().num_nodes()
    assert after < before  # the duplicated product collapses


def test_composition_constraint_coeff_count():
    constraints = FibAirConfig.constraints(64)
    comp = compose_constraints(64, constraints)
    assert comp.num_composition_coeffs() == 2 * len(constraints)


def test_graph_eval_scalar():
    e = (curr(0) + constant(Fp(3))) * (curr(0) + constant(Fp(3))) / constant(Fp(2))
    val = e.graph_eval(lambda leaf: Fp(7) if hasattr(leaf, "column") else leaf.value)
    assert val == Fp(10) * Fp(10) / Fp(2)


def test_vector_evaluator_matches_scalar():
    """Evaluate a constraint DAG over a small CE domain on device and compare
    with per-point scalar graph_eval (the reference's eval_gpu test pattern,
    src/eval_gpu.rs:901-1091)."""
    trace_len, blowup = 8, 2
    n = trace_len * blowup
    dom = Domain(n, GENERATOR)
    rng = np.random.default_rng(5)
    col0 = [int(v) for v in rng.integers(0, P, size=n, dtype=np.uint64)]
    col1 = [int(v) for v in rng.integers(0, P, size=n, dtype=np.uint64)]

    expr = ((curr(0) * curr(1) + challenge(0)) * x()
            - next(0) / (x().pow(trace_len) - constant(Fp(1)))).cse()

    chals = [Fp(0xDEAD)]
    evaluator = ev.VectorEvaluator(n, blowup, fq_is_ext=False)
    ctx = {
        "x_lde": fd.pack_np([dom.element(i).v for i in range(n)]),
        "base_cols": [fd.pack_np(col0), fd.pack_np(col1)],
        "ext_cols": [],
        "challenges": chals,
        "hints": [],
        "composition_coeffs": [],
        "trace_len": trace_len,
    }
    got = fd.to_ints(evaluator.evaluate(expr, ctx))

    for i in range(n):
        def leaf_val(leaf, i=i):
            from ministark_tpu.expression import Challenge, Constant, Trace, X
            if isinstance(leaf, X):
                return dom.element(i)
            if isinstance(leaf, Constant):
                return leaf.value
            if isinstance(leaf, Challenge):
                return chals[leaf.index]
            if isinstance(leaf, Trace):
                col = col0 if leaf.column == 0 else col1
                return Fp(col[(i + blowup * leaf.offset) % n])
            raise TypeError(leaf)
        want = expr.graph_eval(leaf_val)
        assert got[i] == want.v, f"mismatch at {i}"


def test_air_metadata():
    opts = ProofOptions(8, 4, 0, 4, 4)
    air = Air(FibAirConfig, 64, Fp(1), opts)
    assert air.num_challenges() == 0
    assert air.ce_blowup_factor >= 1
    assert air.trace_arguments()[0] == (0, 0)
    assert len(air.trace_arguments()) == 16  # 8 curr + 8 next
