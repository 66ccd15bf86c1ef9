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
def test_fused_matches_per_term(monkeypatch):
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
