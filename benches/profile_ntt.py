"""Capture a jax.profiler device trace of the 2^22-point coset NTT (and
optionally the fib phase pipeline) for perf work on the real chip.

Usage (plain env, real TPU):
    python benches/profile_ntt.py /tmp/ntt_trace
    # then: tensorboard --logdir /tmp/ntt_trace   (or xprof)

The interesting questions for the current ~300 Melem/s number:
  * how much time the two fused column-kernel passes take vs the
    bit-reverse gathers and the six-step transpose (HBM relayouts);
  * whether the twiddle-matrix multiply is fused into the epilogue;
  * idle gaps from the relay (dispatch latency) between passes.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ntt_trace"
    n = 1 << 22
    dom = Domain(n, GENERATOR)
    rng = np.random.default_rng(0)
    lo, hi = fd.pack_np(rng.integers(0, P, size=n, dtype=np.uint64))
    x = (jnp.asarray(lo), jnp.asarray(hi))

    out = dom.fft_fp(x)  # compile
    jax.block_until_ready(out)
    _ = int(out[0][0])

    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for _ in range(5):
        with jax.profiler.TraceAnnotation("coset_ntt_2e22"):
            out = dom.fft_fp(out)
    jax.block_until_ready(out)
    _ = int(out[0][0])
    dt = (time.perf_counter() - t0) / 5
    jax.profiler.stop_trace()
    print(f"trace -> {logdir}; {n / dt / 1e6:.1f} Melem/s")


if __name__ == "__main__":
    main()
