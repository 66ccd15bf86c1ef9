"""A/B the col_ntt kernel variants on the real chip: grid-stage+canonical
(old) vs unrolled-static-shift+lazy (new).  Checks bit-equality first.

Usage (plain env, real TPU): PYTHONPATH=/root/repo:$PYTHONPATH python benches/ntt_variants.py [log2_n]
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

    xr = jax.jit(lambda a: _bitrev_axis0(a, n1))(x)
    jax.block_until_ready(xr)

    old = jax.jit(lambda a: ntt_pallas.col_ntt(a, tw1, tmat=tmat2, unrolled=False))
    new = jax.jit(lambda a: ntt_pallas.col_ntt(a, tw1, tmat=tmat2, unrolled=True))

    dt_old, y_old = _timeit(old, xr)
    print(f"col_ntt grid-stage (+tmat):   {dt_old*1e3:7.2f} ms")
    dt_new, y_new = _timeit(new, xr)
    print(f"col_ntt unrolled+lazy (+tmat):{dt_new*1e3:7.2f} ms  "
          f"({dt_old/dt_new:.2f}x)")

    ok = (np.array_equal(np.asarray(y_old[0]), np.asarray(y_new[0]))
          and np.array_equal(np.asarray(y_old[1]), np.asarray(y_new[1])))
    print("bit-equal:", ok)
    if not ok:
        a = np.asarray(y_old[0]).astype(np.uint64) | (np.asarray(y_old[1]).astype(np.uint64) << 32)
        b = np.asarray(y_new[0]).astype(np.uint64) | (np.asarray(y_new[1]).astype(np.uint64) << 32)
        bad = np.argwhere(a != b)
        print("mismatches:", bad.shape[0], "first:", bad[:4],
              a[tuple(bad[0])], b[tuple(bad[0])])
        sys.exit(1)

    dt, _ = _timeit(lambda a: dom.fft_fp((a[0].reshape(n), a[1].reshape(n))), x)
    print(f"full coset fft:               {dt*1e3:7.2f} ms  = {n/dt/1e6:.0f} Melem/s")


if __name__ == "__main__":
    main()
