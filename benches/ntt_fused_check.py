"""Correctness + speed check of the fused-scale six-step path on the real
chip: fused Pallas coset fft/ifft vs the XLA reference path (spmd_mode
forces it), plus roundtrip, at 2^14 and 2^22.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benches/ntt_fused_check.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    _ = int(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = int(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax

    from ministark_tpu import runtime
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    rng = np.random.default_rng(1)
    for log2_n in (14, 22):
        n = 1 << log2_n
        dom = Domain(n, GENERATOR)
        lo, hi = fd.pack_np(rng.integers(0, P, size=n, dtype=np.uint64))
        import jax.numpy as jnp
        x = (jnp.asarray(lo), jnp.asarray(hi))

        ev = dom.fft_fp(x)
        jax.block_until_ready(ev)
        with runtime.spmd_mode():
            ev_ref = dom.fft_fp(x)
        jax.block_until_ready(ev_ref)
        ok_f = (np.array_equal(np.asarray(ev[0]), np.asarray(ev_ref[0]))
                and np.array_equal(np.asarray(ev[1]), np.asarray(ev_ref[1])))

        rt = dom.ifft_fp(ev)
        jax.block_until_ready(rt)
        ok_rt = (np.array_equal(np.asarray(rt[0]), lo)
                 and np.array_equal(np.asarray(rt[1]), hi))
        print(f"2^{log2_n}: fft matches XLA ref: {ok_f}   "
              f"ifft(fft(x)) == x: {ok_rt}")
        if not (ok_f and ok_rt):
            sys.exit(1)

    n = 1 << 22
    dom = Domain(n, GENERATOR)
    lo, hi = fd.pack_np(rng.integers(0, P, size=n, dtype=np.uint64))
    import jax.numpy as jnp
    x = (jnp.asarray(lo), jnp.asarray(hi))
    dt, _ = _timeit(dom.fft_fp, x)
    print(f"2^22 coset fft:  {dt*1e3:7.2f} ms = {n/dt/1e6:.0f} Melem/s")
    dt, _ = _timeit(dom.ifft_fp, x)
    print(f"2^22 coset ifft: {dt*1e3:7.2f} ms = {n/dt/1e6:.0f} Melem/s")


if __name__ == "__main__":
    main()
