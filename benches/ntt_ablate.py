"""Attribute the six-step NTT's device time by ABLATION: time the full
batched pipeline and variants with individual passes removed, each chained
CH times inside ONE jit program (per-dispatch relay overhead otherwise
swamps the numbers — benches/ntt_passes.py's standalone steps don't sum to
the full program's time).

Variants (results are numerically wrong for ablated ones — only time
matters):
  full      bitrev1 + k1(tmat,pre) + transpose + bitrev2 + k2 + transpose2
  nobitrev  both bitrev row-gathers removed
  nokernel  col_ntt calls replaced by identity (data movement only)
  notrans   the two inter-pass transposes replaced by reshapes (same bytes,
            layout-compatible no-op movement)

Usage (plain env, real TPU): python benches/ntt_ablate.py [log2_n]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CH = 4
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain, _split_n, _bitrev_axis0, _tree_map
    from ministark_tpu.ops import ntt_pallas

    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2_n
    n1, n2 = _split_n(n)
    dom = Domain(n, GENERATOR)
    root = dom.group_gen

    rng = np.random.default_rng(0)
    lo, hi = fd.pack_np(rng.integers(0, P, size=n, dtype=np.uint64))
    x0 = (jnp.asarray(lo).reshape(n1, n2), jnp.asarray(hi).reshape(n1, n2))

    tw1 = ntt_pallas.stage_twiddles(pow(root, n2, P), n1)
    tw2 = ntt_pallas.stage_twiddles(pow(root, n1, P), n2)
    tmat = dom._fwd_tmat()
    tmat2 = (tmat[0].reshape(n1, n2), tmat[1].reshape(n1, n2))
    pre = dom._scale_brv_tbl()

    def pipeline(x, *, bitrev=True, kernels=True, transpose=True):
        if bitrev:
            x = _bitrev_axis0(x, n1)
        if kernels:
            x = ntt_pallas.col_ntt(x, tw1, tmat=tmat2, pre=pre, canon=False,
                                   lane_period=n2)
        if transpose:
            x = _tree_map(lambda t: t.reshape(n1, n2).T.reshape(n2, n1), x)
        else:
            x = _tree_map(lambda t: t.reshape(n2, n1), x)
        if bitrev:
            x = _bitrev_axis0(x, n2)
        if kernels:
            x = ntt_pallas.col_ntt(x, tw2, lane_period=n1)
        if transpose:
            x = _tree_map(lambda t: t.reshape(n2, n1).T.reshape(n1, n2), x)
        return x

    def chained(flags):
        @jax.jit
        def run(x):
            for _ in range(CH):
                x = pipeline(x, **flags)
            return x
        return run

    for name, flags in [
        ("full", {}),
        ("nobitrev", {"bitrev": False}),
        ("nokernel", {"kernels": False}),
        ("notrans", {"transpose": False}),
    ]:
        fn = chained(flags)
        out = fn(x0)
        _ = int(out[0][0, 0])
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(out)
            _ = int(out[0][0, 0])
            times.append(time.perf_counter() - t0)
        per = min(times) / CH
        print(f"{name:9s}: {per*1e3:7.2f} ms/transform "
              f"({n/per/1e6:6.0f} Melem/s)", flush=True)


if __name__ == "__main__":
    main()
