"""Fused Pallas DEEP composition (interpret mode) vs the chunked-XLA path.

Covers both field modes: base-only (fib-style, fq == fp) and Fq3 extension
(brainfuck-style).  Same oracle pattern as the reference's GPU-vs-CPU tests
(src/eval_gpu.rs:901-1091)."""

import numpy as np
import pytest

from ministark_tpu.air import Air, Hints, ProofOptions
from ministark_tpu.composer import DeepCompositionCoeffs, DeepPolyComposer
from ministark_tpu.constraints import Constraint, curr, next
from ministark_tpu.fields import device as fd
from ministark_tpu.fields.scalar import Fp, Fq3, P
from ministark_tpu.matrix import Matrix, MatrixExt3


def _rand_matrix(rng, ncols, n):
    lo, hi = fd.pack_np(rng.integers(0, P, (ncols, n), dtype=np.uint64))
    import jax.numpy as jnp

    return Matrix(jnp.asarray(lo), jnp.asarray(hi))


def _rand_matrix_ext3(rng, ncols, n):
    import jax.numpy as jnp

    comps = []
    for _ in range(3):
        lo, hi = fd.pack_np(rng.integers(0, P, (ncols, n), dtype=np.uint64))
        comps.append((jnp.asarray(lo), jnp.asarray(hi)))
    return MatrixExt3(*comps)


@pytest.mark.slow
def test_deep_fused_base_matches_chunked(monkeypatch, no_persistent_cache):
    from ministark_tpu.models.fib import FibAirConfig

    trace_len = 512
    opts = ProofOptions(8, 8, 0, 8, 64)  # blowup 8 -> lde 4096 = 512*8
    air = Air(FibAirConfig, trace_len, Fp(7), opts)
    n = trace_len * opts.lde_blowup_factor
    rng = np.random.default_rng(11)
    base_lde = _rand_matrix(rng, 8, n)
    comp_lde = _rand_matrix(rng, air.ce_blowup_factor, n)

    composer = DeepPolyComposer(air, Fp(987654321), base_lde, None, comp_lde)
    composer.get_ood_evals()
    nargs = len(air.trace_arguments())
    coeffs = DeepCompositionCoeffs(
        [Fp(int(v)) for v in rng.integers(1, 2**60, nargs)],
        [Fp(int(v)) for v in rng.integers(1, 2**60, air.ce_blowup_factor)],
        (Fp(3), Fp(4)))

    ref = composer.deep_lde(coeffs)
    monkeypatch.setenv("MINISTARK_TPU_FUSED_DEEP", "interpret")
    got = composer.deep_lde(coeffs)
    for rc, gc in zip(ref, got):
        assert fd.to_ints(rc) == fd.to_ints(gc)


class TinyExtConfig:
    NUM_BASE_COLUMNS = 2
    NUM_EXTENSION_COLUMNS = 1
    fp_type = Fp
    fq_type = Fq3

    @staticmethod
    def gen_hints(trace_len, public_inputs, challenges) -> Hints:
        return Hints([])

    @staticmethod
    def constraints(trace_len):
        return [Constraint(curr(0) * next(1) - curr(2))]


@pytest.mark.slow
def test_deep_fused_ext_matches_chunked(monkeypatch, no_persistent_cache):
    trace_len = 512
    opts = ProofOptions(8, 8, 0, 8, 64)
    air = Air(TinyExtConfig, trace_len, Fp(0), opts)
    n = trace_len * opts.lde_blowup_factor
    rng = np.random.default_rng(12)
    base_lde = _rand_matrix(rng, 2, n)
    ext_lde = _rand_matrix_ext3(rng, 1, n)
    comp_lde = _rand_matrix_ext3(rng, air.ce_blowup_factor, n)

    z = Fq3(3, 4, 5)
    composer = DeepPolyComposer(air, z, base_lde, ext_lde, comp_lde)
    composer.get_ood_evals()
    nargs = len(air.trace_arguments())
    coeffs = DeepCompositionCoeffs(
        [Fq3(*[int(v) for v in rng.integers(1, 2**60, 3)])
         for _ in range(nargs)],
        [Fq3(*[int(v) for v in rng.integers(1, 2**60, 3)])
         for _ in range(air.ce_blowup_factor)],
        (Fq3(1, 2, 3), Fq3(4, 5, 6)))

    ref = composer.deep_lde(coeffs)
    monkeypatch.setenv("MINISTARK_TPU_FUSED_DEEP", "interpret")
    got = composer.deep_lde(coeffs)
    for rc, gc in zip(ref, got):
        assert fd.to_ints(rc) == fd.to_ints(gc)
