"""Phase timing + profiling (reference uses RAII println timers,
src/utils.rs:32-51, plus Metal debug capture labels, gpu/src/plan.rs:58-59).

* Set MINISTARK_TPU_TIMERS=0 to silence the phase prints.
* Set MINISTARK_TPU_SYNC_TIMERS=1 to append a device round-trip barrier to
  every phase, so each print is TRUE phase device time (by default phases
  dispatch async and their device work lands in a later phase's readback —
  round-3's "composition commitment 1282 ms" was partly constraint eval).
* Set MINISTARK_TPU_PROFILE=<dir> to wrap each prover phase in a named
  `jax.profiler.TraceAnnotation` and capture a device trace into <dir> per
  prove — started at the first phase, stopped when default_prove returns
  (error paths included).  Open with TensorBoard / xprof; the TPU analogue
  of Xcode GPU capture.
"""

from __future__ import annotations

import os
import time

_PROFILE_DIR = os.environ.get("MINISTARK_TPU_PROFILE")
_trace_started = False


def _maybe_start_trace():
    global _trace_started
    if _PROFILE_DIR and not _trace_started:
        import jax

        jax.profiler.start_trace(_PROFILE_DIR)
        _trace_started = True


def stop_trace():
    """Finish the device trace (called at the end of default_prove)."""
    global _trace_started
    if _trace_started:
        import jax

        jax.profiler.stop_trace()
        _trace_started = False


_SYNC = os.environ.get("MINISTARK_TPU_SYNC_TIMERS") == "1"


def _sync_device():
    """Serialize on the device execution stream: a tiny eager computation is
    queued after all outstanding work, and its host readback (int()) blocks
    until it runs — block_until_ready alone returns early through the axon
    relay (CLAUDE.md)."""
    import jax.numpy as jnp

    int(jnp.zeros((), jnp.uint32) + jnp.uint32(0))


class Timer:
    enabled = os.environ.get("MINISTARK_TPU_TIMERS", "1") != "0"

    def __init__(self, name: str):
        self.name = name
        self._annotation = None

    def __enter__(self):
        if _PROFILE_DIR:
            import jax

            _maybe_start_trace()
            self._annotation = jax.profiler.TraceAnnotation(self.name)
            self._annotation.__enter__()
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._annotation is not None:
            self._annotation.__exit__(*exc)
            self._annotation = None
        if _SYNC and exc == (None, None, None):
            _sync_device()
        if Timer.enabled:
            dt = time.perf_counter() - self.start
            print(f"{self.name}: {dt * 1000:.1f}ms", flush=True)
        return False
