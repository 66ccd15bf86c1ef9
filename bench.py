"""Driver benchmark: prints ONE JSON line.

Round-1 metric: 2^22-point Goldilocks NTT throughput on one chip
(BASELINE.md kernel metric; the reference publishes no absolute numbers, so
vs_baseline is reported against the BASELINE.json target of matching M1-Max
wall-clock — 1.0 until a reference measurement exists)."""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    n = 1 << 22
    dom = Domain(n, GENERATOR)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    lo, hi = fd.pack_np(vals)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    # warmup/compile (a host readback forces full materialization — plain
    # block_until_ready returns early through the axon relay)
    out = dom.fft_fp((lo, hi))
    jax.block_until_ready(out)
    _ = int(out[0][0])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = dom.fft_fp(out)
    jax.block_until_ready(out)
    _ = int(out[0][0])
    dt = (time.perf_counter() - t0) / iters

    melem_s = n / dt / 1e6
    print(json.dumps({
        "metric": "2^22-pt Goldilocks coset NTT",
        "value": round(melem_s, 2),
        "unit": "Melem/s/chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
