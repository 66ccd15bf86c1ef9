"""Phase timing (reference uses RAII println timers, src/utils.rs:32-51).

Set MINISTARK_TPU_TIMERS=0 to silence."""

from __future__ import annotations

import os
import time


class Timer:
    enabled = os.environ.get("MINISTARK_TPU_TIMERS", "1") != "0"

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if Timer.enabled:
            dt = time.perf_counter() - self.start
            print(f"{self.name}: {dt * 1000:.1f}ms", flush=True)
        return False
