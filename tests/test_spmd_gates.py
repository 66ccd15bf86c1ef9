"""SPMD-mode gating: a mesh-sharded prove must run with runtime.spmd() set
and must never select a Pallas path on ANY backend — GSPMD cannot partition
pallas_call over mesh-sharded operands, so a TPU-backend sharded prove that
traced a Pallas kernel would fail to compile (VERDICT r2 weak #1)."""

import jax
import pytest

from ministark_tpu import merkle, ntt, prover, runtime
from ministark_tpu.air import ProofOptions
from ministark_tpu.fields import device as fd
from ministark_tpu.fields.scalar import Fp
from ministark_tpu.models.fib import FibClaim, gen_trace
from ministark_tpu.parallel import sharded
from ministark_tpu.parallel.prover import prove_sharded


@pytest.mark.slow
def test_prove_sharded_enters_spmd_mode(monkeypatch):
    """runtime.spmd() is True for the whole sharded prove (checked inside
    default_prove, i.e. inside every phase) and restored afterwards."""
    seen = {}
    orig = prover.default_prove

    def spy(*args, **kwargs):
        seen["spmd"] = runtime.spmd()
        return orig(*args, **kwargs)

    monkeypatch.setattr(prover, "default_prove", spy)
    trace = gen_trace(128)
    claim = FibClaim(trace.last_value())
    opts = ProofOptions(num_queries=4, lde_blowup_factor=4, grinding_factor=1,
                        fri_folding_factor=4, fri_max_remainder_coeffs=4)
    mesh = sharded.make_mesh(8)
    proof = prove_sharded(claim, opts, trace, mesh)
    assert seen["spmd"] is True
    assert runtime.spmd() is False
    assert proof.to_bytes(Fp) == claim.prove(opts, trace).to_bytes(Fp)


def test_gates_reject_pallas_under_spmd_on_tpu_backend(monkeypatch):
    """Simulate the TPU backend: without spmd_mode every gate picks its
    Pallas path; inside spmd_mode every gate must fall back to the
    XLA-partitionable path."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # TPU backend, no SPMD: Pallas paths selected
    assert ntt._use_pallas(1 << 22)
    assert merkle._lanes_mode() == "run"
    assert runtime.fused_ok("MINISTARK_TPU_FUSED_EVAL")
    assert runtime.fused_ok("MINISTARK_TPU_FUSED_DEEP")
    assert runtime.fused_ok(None)

    with runtime.spmd_mode():
        assert not ntt._use_pallas(1 << 22)
        assert merkle._lanes_mode() is None
        assert not runtime.fused_ok("MINISTARK_TPU_FUSED_EVAL")
        assert not runtime.fused_ok("MINISTARK_TPU_FUSED_DEEP")
        assert not runtime.fused_ok(None)

    # restored on exit
    assert ntt._use_pallas(1 << 22)


def test_inv_gate_rejects_pallas_under_spmd(monkeypatch):
    from ministark_tpu.ops import inv_pallas

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    shape = (1 << 16,)
    if not inv_pallas.eligible(shape):
        pytest.skip("shape not eligible for the fused inverse")
    assert fd._pallas_inv_mode(shape) == "run"
    with runtime.spmd_mode():
        assert fd._pallas_inv_mode(shape) is None


def test_interpret_env_flags_still_off_under_spmd(monkeypatch):
    """The CPU test-override env flags must not punch through SPMD mode."""
    monkeypatch.setenv("MINISTARK_TPU_FUSED_EVAL", "interpret")
    monkeypatch.setenv("MINISTARK_TPU_LANES", "interpret")
    assert runtime.fused_ok("MINISTARK_TPU_FUSED_EVAL")
    assert merkle._lanes_mode() == "interpret"
    with runtime.spmd_mode():
        assert not runtime.fused_ok("MINISTARK_TPU_FUSED_EVAL")
        assert merkle._lanes_mode() is None


class _Sentinel(Exception):
    pass


def test_sharded_executor_selects_pallas_on_tpu_backend(monkeypatch):
    """The hand-scheduled executor's per-chip bodies must select the fused
    Pallas column-NTT on a (simulated) TPU backend — the whole point of the
    shard_map route vs blanket GSPMD-with-fusions-off (VERDICT r3 weak #2).
    The spy raises at trace time, proving the kernel WOULD be emitted."""
    from ministark_tpu.fields.scalar import GENERATOR
    from ministark_tpu.models.fib import gen_trace as fib_trace
    from ministark_tpu.ntt import Domain
    from ministark_tpu.ops import ntt_pallas
    from ministark_tpu.parallel.executor import ShardedExecutor

    calls = []

    def spy(*a, **k):
        calls.append("col_ntt")
        raise _Sentinel

    monkeypatch.setattr(ntt_pallas, "col_ntt", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    mesh = sharded.make_mesh(8)
    ex = ShardedExecutor(mesh)
    m = fib_trace(1 << 17).base_columns()  # 2^14 rows >= _SIX_STEP_MIN
    with pytest.raises(_Sentinel):
        ex.lde_commit_fp(m, Domain(1 << 14), Domain(1 << 16, GENERATOR))
    assert calls == ["col_ntt"]


def test_sharded_executor_fri_fold_selects_pallas_on_tpu_backend(monkeypatch):
    """The distributed six-step inside the executor's FRI fold runs the
    Pallas column kernel on each chip's local shard off-CPU
    (parallel/ntt.py _local_col_ntt)."""
    import jax.numpy as jnp
    import numpy as np

    from ministark_tpu.fields.scalar import P
    from ministark_tpu.ops import ntt_pallas
    from ministark_tpu.parallel.executor import ShardedExecutor

    calls = []

    def spy(*a, **k):
        calls.append("col_ntt")
        raise _Sentinel

    monkeypatch.setattr(ntt_pallas, "col_ntt", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    mesh = sharded.make_mesh(8)
    ex = ShardedExecutor(mesh)
    n, N = 1 << 20, 4
    assert ex.fri_fold_supported(n, N)
    vals = np.zeros(n, dtype=np.uint32)
    evals = (jnp.asarray(vals), jnp.asarray(vals))
    with pytest.raises(_Sentinel):
        ex.fri_fold(evals, n, N, Fp(123), fq_is_ext=False)
    assert calls
