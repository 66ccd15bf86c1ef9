"""Process-wide execution-mode flags.

``spmd_mode`` is entered by the multi-chip prover (parallel/prover.py): it
forces every jitted phase program onto XLA-partitionable paths — no Pallas
kernels (GSPMD cannot partition pallas_call over mesh-sharded operands) and
no host callbacks (they abort when operands arrive sharded).  Gates that
consult these flags run at TRACE time, so program caches keyed per
(shape, config) must also key on ``spmd()``.
"""

from __future__ import annotations

_spmd = False


def spmd() -> bool:
    return _spmd


def fused_ok(env_flag: str | None = None) -> bool:
    """Common trace-time gate for the fused Pallas paths (eval / deep / NTT /
    Merkle lanes / inverse): off-CPU — or force-interpret via `env_flag` on
    the CPU test backend — and NEVER in SPMD mode."""
    import os

    import jax

    if _spmd:
        return False
    if jax.default_backend() != "cpu":
        return True
    return env_flag is not None and os.environ.get(env_flag) == "interpret"


class spmd_mode:
    """Context manager: force SPMD-partitionable code paths."""

    def __enter__(self):
        global _spmd
        self._old = _spmd
        _spmd = True
        return self

    def __exit__(self, *exc):
        global _spmd
        _spmd = self._old
        return False
