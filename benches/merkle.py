"""Merkle bench matrix mirroring the reference harness
(benches/merkle_tree.rs:17,27-39): 2^14..2^17 leaves, 3 Goldilocks columns
per row, SHA-256 `from_matrix` commitment (row hash + full tree build).

Run on the real chip (plain env): `python benches/merkle.py`

Prints one JSON line per size: {"bench": "merkle", "leaves", "ms",
"mleaves_s"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

SIZES = [1 << 14, 1 << 15, 1 << 16, 1 << 17]
NCOLS = 3
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu import merkle
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import P

    rng = np.random.default_rng(0)
    for n in SIZES:
        lo, hi = fd.pack_np(rng.integers(0, P, (NCOLS, n), dtype=np.uint64))
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)

        tree = merkle.commit_matrix_fp(lo, hi)
        root = tree.root()  # forces the full build + readback

        t0 = time.perf_counter()
        for _ in range(ITERS):
            tree = merkle.commit_matrix_fp(lo, hi)
            root = tree.root()
        dt = (time.perf_counter() - t0) / ITERS
        assert root
        print(json.dumps({
            "bench": "merkle", "leaves": n, "ms": round(dt * 1e3, 3),
            "mleaves_s": round(n / dt / 1e6, 2)}))


if __name__ == "__main__":
    main()
