"""Fused Pallas constraint evaluator (interpret mode) vs the per-term XLA
path — the analogue of the reference's eval_gpu-vs-CPU oracle tests
(src/eval_gpu.rs:901-1091)."""

import os

import numpy as np
import pytest

from ministark_tpu import eval as ev
from ministark_tpu.air import Air, Challenges, Hints, ProofOptions
from ministark_tpu.fields import Fp, P
from ministark_tpu.fields import device as fd
from ministark_tpu.models.fib import FibAirConfig


@pytest.mark.slow
def test_fused_matches_per_term(monkeypatch, no_persistent_cache):
    trace_len = 4096  # smallest CE size the fused path accepts (512*8)
    opts = ProofOptions(8, 4, 0, 8, 64)
    air = Air(FibAirConfig, trace_len, Fp(7), opts)
    n = trace_len * air.ce_blowup_factor
    dom = air.ce_domain()
    x_lde = dom.elements_device()
    rng = np.random.default_rng(3)
    base = [fd.pack_np(rng.integers(0, P, n, dtype=np.uint64)) for _ in range(8)]
    coeffs = [Fp(int(v)) for v in
              rng.integers(1, 2**60, air.num_composition_constraint_coeffs(),
                           dtype=np.uint64)]
    hints = Hints([Fp(5)])

    ref = fd.to_ints(ev.eval_composition(air, coeffs, [], hints, x_lde, base, None))

    monkeypatch.setenv("MINISTARK_TPU_FUSED_EVAL", "interpret")
    got = fd.to_ints(ev.eval_composition(air, coeffs, [], hints, x_lde, base, None))
    assert got == ref


@pytest.mark.slow
def test_fused_matches_per_term_ext(monkeypatch, no_persistent_cache):
    """Fq3 AIR with BASE-FIELD zerofier denominators: the fused plan types
    every inverse input as Ext3 while the denominator itself evaluates in
    Fp — the promotion in eval.run_denoms must keep the two in sync
    (regression: brainfuck-on-TPU crashed reshaping a scalar)."""
    from ministark_tpu.constraints import (Constraint, challenge, constant,
                                           curr, next, x)
    from ministark_tpu.fields import Fq3
    from ministark_tpu.ntt import Domain

    class TinyExtDivConfig:
        NUM_BASE_COLUMNS = 2
        NUM_EXTENSION_COLUMNS = 1
        fp_type = Fp
        fq_type = Fq3

        @staticmethod
        def gen_hints(trace_len, public_inputs, challenges):
            return Hints([])

        @staticmethod
        def constraints(trace_len):
            dom = Domain(trace_len)
            one = constant(Fp(1))
            first_x = constant(dom.element(0))
            last_x = constant(dom.element(trace_len - 1))
            transition = (next(2) * challenge(0) - curr(0) * curr(1)) * (
                (x() - last_x) / (x().pow(trace_len) - one))
            boundary = (curr(2) - challenge(0)) / (x() - first_x)
            return [Constraint(transition), Constraint(boundary)]

    trace_len = 4096
    opts = ProofOptions(8, 8, 0, 8, 64)
    air = Air(TinyExtDivConfig, trace_len, Fp(0), opts)
    n = trace_len * air.ce_blowup_factor
    assert n % (512 * 8) == 0, "config must hit the fused path"
    dom = air.ce_domain()
    x_lde = dom.elements_device()
    rng = np.random.default_rng(4)
    base = [fd.pack_np(rng.integers(0, P, n, dtype=np.uint64))
            for _ in range(2)]
    ext = [tuple(fd.pack_np(rng.integers(0, P, n, dtype=np.uint64))
                 for _ in range(3))]
    from ministark_tpu.fields import Fq3 as _Fq3

    challenges = Challenges([_Fq3(3, 4, 5)])
    coeffs = [_Fq3(*[int(v) for v in rng.integers(1, 2**60, 3)])
              for _ in range(air.num_composition_constraint_coeffs())]
    hints = Hints([])

    ref = ev.eval_composition(air, coeffs, challenges, hints, x_lde, base, ext)
    ref_ints = [fd.to_ints(c) for c in ref]

    monkeypatch.setenv("MINISTARK_TPU_FUSED_EVAL", "interpret")
    got = ev.eval_composition(air, coeffs, challenges, hints, x_lde, base, ext)
    assert [fd.to_ints(c) for c in got] == ref_ints
