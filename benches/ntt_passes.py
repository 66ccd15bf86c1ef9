"""Time each pass of the six-step 2^22 NTT separately on the real chip:
bit-reverse row gather, fused column kernel (with/without twiddle-matrix
epilogue), and the transpose.  Answers where the ~14ms per transform goes.

Usage (plain env, real TPU): python benches/ntt_passes.py [log2_n]
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
    leaf = jax.tree.leaves(out)[0]
    _ = int(leaf.reshape(-1)[0])  # force full readback through the relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = int(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters, out


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
    tmat = dom._fwd_tmat()
    tmat2 = (tmat[0].reshape(n1, n2), tmat[1].reshape(n1, n2))

    bitrev = jax.jit(lambda a: _bitrev_axis0(a, n1))
    dt, xr = _timeit(bitrev, x)
    print(f"bitrev rows ({n1}x{n2}):          {dt*1e3:7.2f} ms")

    dt, _ = _timeit(jax.jit(lambda a: ntt_pallas.col_ntt(a, tw1)), xr)
    print(f"col_ntt (no tmat):                {dt*1e3:7.2f} ms")

    dt, y = _timeit(
        jax.jit(lambda a: ntt_pallas.col_ntt(a, tw1, tmat=tmat2)), xr)
    print(f"col_ntt (+tmat epilogue):         {dt*1e3:7.2f} ms")

    tr = jax.jit(lambda a: (jnp.swapaxes(a[0], 0, 1), jnp.swapaxes(a[1], 0, 1)))
    dt, _ = _timeit(tr, y)
    print(f"transpose:                        {dt*1e3:7.2f} ms")

    dt, _ = _timeit(lambda a: dom.fft_fp((a[0].reshape(n), a[1].reshape(n))), x)
    print(f"full coset fft ({n>>20}Mi pts):        {dt*1e3:7.2f} ms  "
          f"= {n/dt/1e6:.0f} Melem/s")


if __name__ == "__main__":
    main()
