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


import contextlib


@contextlib.contextmanager
def cpu_no_persistent_cache():
    """XLA:CPU on this image SEGFAULTS (de)serializing some shard_map/SPMD
    executables through the persistent compilation cache — both in the
    write and in a later read of a written entry (observed: the distributed
    six-step NTT wrappers; earlier, a fused ext3 commit program).  Wrap
    shard_map program CALLS in this guard: the first call still compiles,
    but the disk cache is bypassed in both directions on the CPU backend.
    TPU is unaffected and keeps full caching."""
    import jax

    if jax.default_backend() != "cpu":
        yield
        return
    old = jax.config.jax_enable_compilation_cache
    if not old:
        yield
        return
    # Flipping the config alone is NOT enough: jax memoizes "is the cache
    # used" process-wide on the first compile (compilation_cache._cache_checked),
    # after which _get_cache_key ignores the config.  reset_cache() clears
    # that memo (cheap — the disk cache itself is untouched) so the disabled
    # config actually takes effect, and again on exit so later compiles
    # re-enable it.
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", old)
        _cc.reset_cache()


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


class spmd_off:
    """Temporarily clear the SPMD flag: used by the hand-scheduled
    shard_map executor (parallel/executor.py) while tracing its PER-CHIP
    programs — inside shard_map each chip runs ordinary single-device code,
    so the Pallas kernels ARE legal there and the trace-time gates
    (`fused_ok`, `ntt._use_pallas`, `merkle._lanes_mode`) must not veto
    them even though the surrounding prove runs under ``spmd_mode``."""

    def __enter__(self):
        global _spmd
        self._old = _spmd
        _spmd = False
        return self

    def __exit__(self, *exc):
        global _spmd
        _spmd = self._old
        return False
