"""Break down the composition-commit phase (the top warm-phase cost at the
2^24-value fib workload: 1282 ms of 3.3 s, docs/RESULTS.md) into its device
steps, timed separately on the real chip:

    CE iNTT (2^22)  ->  split cb columns  ->  coset NTT (cb x 2^23)
    ->  row hash  ->  digest bitrev  ->  tree levels

Usage (plain env, real TPU): python benches/comp_commit.py [log2_trace_len]
Defaults to the fib headline shape: trace_len 2^21, cb 2, blowup 4.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    _ = int(jax.tree.leaves(out)[0].reshape(-1)[0])  # full readback barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = int(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / iters, out


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu import merkle
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain, permute_bitrev
    from ministark_tpu.ops import sha256_pallas as spl
    from ministark_tpu.prover import _comp_commit_program

    log2_t = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    trace_len = 1 << log2_t
    cb = 2
    blowup = 4
    ce_dom = Domain(trace_len * cb, GENERATOR)
    lde_dom = Domain(trace_len * blowup, GENERATOR)
    print(f"trace_len 2^{log2_t}, ce {ce_dom.size}, lde {lde_dom.size}",
          flush=True)

    rng = np.random.default_rng(0)
    lo, hi = fd.pack_np(rng.integers(0, P, ce_dom.size, dtype=np.uint64))
    evals = (jnp.asarray(lo), jnp.asarray(hi))

    # tables OUTSIDE any trace (powers()/lru caches must never see tracers)
    itabs = (ce_dom._inv_tbl(), ce_dom._unscale_tbl(), ce_dom._inv_tmat(),
             ce_dom._ipost_tbl())
    ftabs = (lde_dom._fwd_tbl(), lde_dom._scale_tbl(), lde_dom._fwd_tmat(),
             lde_dom._scale_brv_tbl())

    # step 1: CE iNTT
    dt, coeffs = _timeit(jax.jit(ce_dom._ifft_fp_impl), evals, *itabs)
    print(f"CE iNTT ({ce_dom.size >> 20}Mi):            {dt*1e3:8.2f} ms",
          flush=True)

    # step 2: split + batched coset NTT (cb cols x lde_n)
    def split_ntt(c, ftbl, fscale, ftmat, fbrv):
        polys = (c[0].reshape(trace_len, cb).T, c[1].reshape(trace_len, cb).T)
        return lde_dom._fft_fp_impl(polys, ftbl, fscale, ftmat, fbrv)

    dt, lde = _timeit(jax.jit(split_ntt), coeffs, *ftabs)
    print(f"split + coset NTT ({cb}x{lde_dom.size >> 20}Mi):     "
          f"{dt*1e3:8.2f} ms", flush=True)

    # step 3: row hash (lanes kernel)
    dt, lanes = _timeit(
        jax.jit(lambda m: spl.hash_rows_fp_lanes(m[0], m[1])), lde)
    print(f"row hash ({lde_dom.size >> 20}Mi rows):          "
          f"{dt*1e3:8.2f} ms", flush=True)

    # step 4 (historical): digest bitrev permute (8, n) lane gather — no
    # longer in the commit path (the bitrev-storage tree cancels it)
    dt, lanes_br = _timeit(
        jax.jit(lambda l: permute_bitrev(l, axis=1)), lanes)
    print(f"digest bitrev (removed):       {dt*1e3:8.2f} ms", flush=True)

    # step 5a: tree levels, NATURAL storage (strided even/odd lane slices)
    dt, _ = _timeit(
        jax.jit(lambda l: merkle.tree_levels_lanes(l, False)), lanes_br)
    print(f"tree levels (natural order):   {dt*1e3:8.2f} ms", flush=True)

    # step 5b: tree levels, TREE-BITREV storage (contiguous-half merges)
    dt, _ = _timeit(
        jax.jit(lambda l: merkle.tree_levels_lanes_br(l, False)), lanes)
    print(f"tree levels (bitrev storage):  {dt*1e3:8.2f} ms", flush=True)

    # whole fused phase program (what the prover dispatches)
    prog = _comp_commit_program(trace_len, cb, ce_dom, lde_dom, False, False)
    dt, _ = _timeit(prog, evals, *itabs, *ftabs)
    print(f"FUSED comp-commit program:     {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
