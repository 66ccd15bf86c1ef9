"""Merkle bench matrix mirroring the reference harness
(benches/merkle_tree.rs:17,27-39): 2^14..2^17 leaves, 3 Goldilocks columns
per row, SHA-256 `from_matrix` commitment (row hash + full tree build).

`python benches/merkle.py big` instead runs the kernel-scale rows:
2^24-leaf SHA-256 commit (BASELINE.md row 4) and 2^23-leaf RPO-256 commit
(the reference's GPU smoke scale, gpu/tests/rpo.rs:15,73) — both built
fully device-resident, only the root crossing the host.

Run on the real chip (plain env).  Prints one JSON line per size:
{"bench": "merkle", "hash", "leaves", "ms", "mleaves_s"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [1 << 14, 1 << 15, 1 << 16, 1 << 17]
NCOLS = 3
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu import hash_rpo, merkle
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import P

    big = "big" in sys.argv[1:]
    runs = ([("sha256", 1 << 24, 2), ("rpo256", 1 << 23, 2)] if big
            else [("sha256", n, ITERS) for n in SIZES])

    rng = np.random.default_rng(0)
    for hname, n, iters in runs:
        hashfn = hash_rpo if hname == "rpo256" else merkle.H
        lo, hi = fd.pack_np(rng.integers(0, P, (NCOLS, n), dtype=np.uint64))
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)

        tree = merkle.commit_matrix_fp(lo, hi, hashfn=hashfn)
        root = tree.root()  # forces the full build + readback

        t0 = time.perf_counter()
        for _ in range(iters):
            tree = merkle.commit_matrix_fp(lo, hi, hashfn=hashfn)
            root = tree.root()
        dt = (time.perf_counter() - t0) / iters
        assert root
        print(json.dumps({
            "bench": "merkle", "hash": hname, "leaves": n,
            "ms": round(dt * 1e3, 3),
            "mleaves_s": round(n / dt / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
