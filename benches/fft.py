"""FFT bench matrix mirroring the reference harness (gpu/benches/fft.rs:18,
29-86): sizes 2048/4096/32768/262144, Goldilocks Fp64 and the 252-bit
StarkWare prime, forward+inverse, plain+coset domains.

Run on the real chip (plain env): `python benches/fft.py`
CPU: `env -u PALLAS_AXON_POOL_IPS PYTHONPATH=.. JAX_PLATFORMS=cpu python benches/fft.py`

Prints one JSON line per cell: {"bench": "fft", "field", "size", "dir",
"coset", "ms", "melem_s"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SIZES = [2048, 4096, 32768, 262144]
ITERS = 10


def _time(fn, out_probe) -> float:
    import jax

    r = fn()
    jax.block_until_ready(r)
    _ = out_probe(r)  # force full materialization through the relay
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn()
    jax.block_until_ready(r)
    _ = out_probe(r)
    return (time.perf_counter() - t0) / ITERS


def bench_fp64():
    import jax.numpy as jnp

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    rng = np.random.default_rng(0)
    for n in SIZES:
        vals = rng.integers(0, P, size=n, dtype=np.uint64)
        lo, hi = fd.pack_np(vals)
        x = (jnp.asarray(lo), jnp.asarray(hi))
        for coset in (False, True):
            dom = Domain(n, GENERATOR if coset else 1)
            for direction, f in (("fwd", dom.fft_fp), ("inv", dom.ifft_fp)):
                dt = _time(lambda f=f, x=x: f(x), lambda r: int(r[0][0]))
                print(json.dumps({
                    "bench": "fft", "field": "fp64", "size": n,
                    "dir": direction, "coset": coset,
                    "ms": round(dt * 1e3, 3),
                    "melem_s": round(n / dt / 1e6, 1)}))


def bench_fp252():
    import jax.numpy as jnp

    from ministark_tpu.fields.bigvec import BigDomain, Fp252Vec

    f = Fp252Vec
    rng = np.random.default_rng(1)
    for n in SIZES:
        vals = [int(rng.integers(0, 1 << 62)) % f.p for _ in range(n)]
        x = jnp.asarray(f.pack(vals))
        for coset in (False, True):
            dom = BigDomain(f, n, f.generator if coset else 1)
            for direction, fn in (("fwd", dom.fft), ("inv", dom.ifft)):
                dt = _time(lambda fn=fn, x=x: fn(x),
                           lambda r: int(np.asarray(r)[0, 0]))
                print(json.dumps({
                    "bench": "fft", "field": "fp252", "size": n,
                    "dir": direction, "coset": coset,
                    "ms": round(dt * 1e3, 3),
                    "melem_s": round(n / dt / 1e6, 1)}))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fp64"):
        bench_fp64()
    if which in ("all", "fp252"):
        bench_fp252()


if __name__ == "__main__":
    main()
