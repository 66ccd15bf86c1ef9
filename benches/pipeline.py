"""Kernel-scale pipeline bench (BASELINE.md: "Batched 2^22-pt NTT +
blowup-8 LDE + 2^24-leaf Merkle commit"): interpolate a (ncols, 2^22)
Goldilocks matrix, evaluate it on a blowup-8 coset (2^25-pt LDEs), and
SHA-256-commit a 2^24-leaf matrix — the prover's phase-1 shape at
production scale.

Run on the real chip (plain env): `python benches/pipeline.py [ncols]`
Prints one JSON line per stage + a composite.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu import merkle
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    ncols = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n = 1 << 22
    blowup = 8
    commit_n = 1 << 24

    trace_dom = Domain(n)
    lde_dom = Domain(n * blowup, GENERATOR)

    rng = np.random.default_rng(0)
    lo, hi = fd.pack_np(rng.integers(0, P, (ncols, n), dtype=np.uint64))
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    def interp_lde():
        polys = trace_dom.ifft_fp((lo, hi))
        return lde_dom.fft_fp(polys)

    # warmup + compile
    lde = interp_lde()
    jax.block_until_ready(lde)
    _ = int(lde[0][0, 0])

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        lde = interp_lde()
    jax.block_until_ready(lde)
    _ = int(lde[0][0, 0])
    dt_lde = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "bench": "pipeline.lde", "ncols": ncols, "n": n, "blowup": blowup,
        "ms": round(dt_lde * 1e3, 1),
        "melem_s": round(ncols * n * blowup / dt_lde / 1e6, 1)}))

    # 2^24-leaf commit over a slice of the LDE (commit_n rows x ncols)
    clo = lde[0][:, :commit_n]
    chi = lde[1][:, :commit_n]
    tree = merkle.commit_matrix_fp(clo, chi)
    root = tree.root()
    t0 = time.perf_counter()
    for _ in range(iters):
        tree = merkle.commit_matrix_fp(clo, chi)
        root = tree.root()
    dt_commit = (time.perf_counter() - t0) / iters
    assert root
    print(json.dumps({
        "bench": "pipeline.commit", "leaves": commit_n, "ncols": ncols,
        "ms": round(dt_commit * 1e3, 1),
        "mleaves_s": round(commit_n / dt_commit / 1e6, 2)}))

    print(json.dumps({
        "bench": "pipeline.total", "ms": round((dt_lde + dt_commit) * 1e3, 1)}))


if __name__ == "__main__":
    main()
