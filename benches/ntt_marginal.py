"""Marginal cost of each pass in the six-step NTT: time nested prefixes of
the pipeline so differences give true in-program per-pass costs (standalone
pass timings are inflated by ~1.5ms of relay dispatch overhead each).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benches/ntt_marginal.py [log2_n]
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
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain, _split_n, _bitrev_axis0
    from ministark_tpu.ops import ntt_pallas

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2_n
    n1, n2 = _split_n(n)
    dom = Domain(n, GENERATOR)
    root = dom.group_gen

    rng = np.random.default_rng(0)
    lo, hi = fd.pack_np(rng.integers(0, P, size=n, dtype=np.uint64))
    x = (jnp.asarray(lo).reshape(n1, n2), jnp.asarray(hi).reshape(n1, n2))

    tw1 = ntt_pallas.stage_twiddles(pow(root, n2, P), n1)
    tw2 = ntt_pallas.stage_twiddles(pow(root, n1, P), n2)
    tmat = dom._fwd_tmat()
    tmat2 = (tmat[0].reshape(n1, n2), tmat[1].reshape(n1, n2))

    def p1(a):
        return ntt_pallas.col_ntt(a, tw1)

    def p2(a):
        return ntt_pallas.col_ntt(a, tw1, tmat=tmat2)

    def p3(a):
        return ntt_pallas.col_ntt(_bitrev_axis0(a, n1), tw1, tmat=tmat2)

    def p4(a):
        y = p3(a)
        return (jnp.swapaxes(y[0], 0, 1), jnp.swapaxes(y[1], 0, 1))

    def p5(a):
        y = p4(a)
        return _bitrev_axis0(y, n2)

    def p6(a):
        return ntt_pallas.col_ntt(p5(a), tw2)

    prev = 0.0
    for name, fn in [("col_ntt", p1), ("+tmat", p2), ("+pre-bitrev", p3),
                     ("+transpose", p4), ("+bitrev2", p5), ("+col_ntt2", p6)]:
        dt = _timeit(jax.jit(fn), x)
        print(f"{name:14s} {dt*1e3:7.2f} ms   (marginal {1e3*(dt-prev):+6.2f})")
        prev = dt

    dt = _timeit(lambda a: dom.fft_fp((a[0].reshape(n), a[1].reshape(n))), x)
    print(f"{'full fft':14s} {dt*1e3:7.2f} ms  = {n/dt/1e6:.0f} Melem/s")


if __name__ == "__main__":
    main()
