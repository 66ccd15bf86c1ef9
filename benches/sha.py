"""SHA-256 lanes-kernel microbench: Merkle-merge shape (W=16, one block).

The tree build is merge-dominated (n leaf hashes + n-1 merges); this times
`merge_lanes` at 2^22 instances with K calls chained inside one jitted
program (single readback — the axon relay adds per-dispatch noise).

Run on the real chip (plain env): `python benches/sha.py`
Prints one JSON line: {"bench": "sha256_merge", "n", "ms", "mhash_s"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 22
CHAIN = 4
REPEATS = 5


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.ops import sha256_pallas as spl

    rng = np.random.default_rng(0)
    left = jnp.asarray(
        rng.integers(0, 1 << 32, size=(8, N), dtype=np.uint64).astype(np.uint32))
    right = jnp.asarray(
        rng.integers(0, 1 << 32, size=(8, N), dtype=np.uint64).astype(np.uint32))

    @jax.jit
    def chained(l, r):
        for _ in range(CHAIN):
            l = spl.merge_lanes(l, r)
        return l

    out = chained(left, right)
    _ = int(out[0, 0])  # force full materialization through the relay

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = chained(out, right)
        _ = int(out[0, 0])
        times.append(time.perf_counter() - t0)

    dt = min(times) / CHAIN
    print(json.dumps({
        "bench": "sha256_merge", "n": N, "ms": round(dt * 1e3, 3),
        "mhash_s": round(N / dt / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
