"""On-chip verification of col_ntt beyond the unrolled kernel's VMEM range
(n1 > UNROLL_MAX_N1 = 4096), plus a 2^26-point coset LDE smoke run
(VERDICT r3 weak #3 / next-round #6).  The unrolled kernel at n1 = 8192 is
a measured VMEM OOM (the (log_n, n1, 1) twiddle operand lane-pads to 128),
so above the threshold col_ntt canonicalizes + applies `pre` outside and
runs the per-stage fori_loop kernel — these checks pin that fallback.

Three checks, all on the real chip (plain env — JAX_PLATFORMS=axon):

1. col_ntt at n1 in {8192, 16384} with pre + tmat + canon=False (the exact
   configuration the batched six-step uses) vs a numpy npfield butterfly
   oracle.
2. 2^26-point coset FFT of a geometric coefficient vector c^k: the
   evaluation at domain point x is ((c*x)^n - 1)/(c*x - 1), closed-form on
   host — 16 spot indices checked end-to-end through the full six-step
   batched pipeline (n1 = 8192 at this size).
3. 2^26 roundtrip: ifft(fft(v)) == v on random input (exercises the
   inverse kernels' post/canon configurations at the same n1).

Run:  python benches/ntt_unroll_range.py [--max-log2 26]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P, get_root_of_unity
    from ministark_tpu.ntt import Domain, bit_reverse_indices
    from ministark_tpu.ops import ntt_pallas

    print(f"backend: {jax.default_backend()}", flush=True)

    from ministark_tpu.fields import npfield

    def np_col_ntt(vals, root, n1, tmat=None, pre=None):
        """npfield oracle for col_ntt's semantics: bit-reversed input along
        axis 0, DIT butterflies, optional pre/tmat elementwise folds."""
        x = vals.copy()
        if pre is not None:
            x = npfield.mul(x, pre)
        log_n = n1.bit_length() - 1
        L = x.shape[1]
        for s in range(1, log_n + 1):
            m = 1 << s
            half = m >> 1
            wm = pow(root, n1 // m, P)
            tw = np.empty(half, dtype=np.uint64)
            acc = 1
            for j in range(half):
                tw[j] = acc
                acc = acc * wm % P
            y = x.reshape(n1 // m, 2, half, L)
            u, v = y[:, 0], npfield.mul(y[:, 1], tw[None, :, None])
            x = np.stack([npfield.add(u, v), npfield.sub(u, v)],
                         axis=1).reshape(n1, L)
        if tmat is not None:
            x = npfield.mul(x, tmat)
        return x

    # -- 1. col_ntt beyond the unrolled range vs npfield oracle ------------
    for n1 in (8192, 16384):
        L = 256
        rng = np.random.default_rng(n1)
        vals = rng.integers(0, P, size=(n1, L), dtype=np.uint64)
        lo = (vals & 0xFFFFFFFF).astype(np.uint32)
        hi = (vals >> 32).astype(np.uint32)
        x = (jnp.asarray(lo), jnp.asarray(hi))

        root = get_root_of_unity(n1).v
        tw = ntt_pallas.stage_twiddles(root, n1)
        tmat_v = rng.integers(0, P, size=(n1, L), dtype=np.uint64)
        pre_v = rng.integers(0, P, size=(n1, L), dtype=np.uint64)
        tmat = (jnp.asarray((tmat_v & 0xFFFFFFFF).astype(np.uint32)),
                jnp.asarray((tmat_v >> 32).astype(np.uint32)))
        pre = (jnp.asarray((pre_v & 0xFFFFFFFF).astype(np.uint32)),
               jnp.asarray((pre_v >> 32).astype(np.uint32)))

        t0 = time.perf_counter()
        a = ntt_pallas.col_ntt(x, tw, tmat=tmat, pre=pre, canon=False)
        a = jax.jit(fd.canonicalize)(a)
        _ = int(a[0][0, 0])
        t_run = time.perf_counter() - t0

        got = (np.asarray(a[0], np.uint64)
               | (np.asarray(a[1], np.uint64) << np.uint64(32)))
        want = np_col_ntt(vals, root, n1, tmat=tmat_v, pre=pre_v)
        ok = np.array_equal(got, want)
        print(f"n1={n1:5d} L={L}: col_ntt-vs-npfield "
              f"{'MATCH' if ok else 'MISMATCH'}  (compile+run {t_run:.1f}s)",
              flush=True)
        if not ok:
            sys.exit(1)

    # -- 2. 2^26 coset FFT, closed-form spot check -------------------------
    max_log2 = 26
    if "--max-log2" in sys.argv:
        max_log2 = int(sys.argv[sys.argv.index("--max-log2") + 1])
    n = 1 << max_log2
    dom = Domain(n, GENERATOR)
    c = 0x123456789ABCDEF % P
    from ministark_tpu.ntt import powers
    coeffs = powers(c, n)  # device table c^k

    t0 = time.perf_counter()
    evals = dom.fft_fp(coeffs)
    _ = int(evals[0][0])
    t_fft = time.perf_counter() - t0
    t0 = time.perf_counter()
    evals = dom.fft_fp(coeffs)
    _ = int(evals[0][0])
    t_warm = time.perf_counter() - t0

    rng = np.random.default_rng(7)
    idxs = rng.integers(0, n, size=16)
    got_lo = np.asarray(evals[0][jnp.asarray(idxs)])
    got_hi = np.asarray(evals[1][jnp.asarray(idxs)])
    g = dom.group_gen
    bad = 0
    for j, i in enumerate(idxs):
        xpt = GENERATOR * pow(g, int(i), P) % P
        q = c * xpt % P
        if q == 1:
            want = n % P
        else:
            want = (pow(q, n, P) - 1) * pow(q - 1, P - 2, P) % P
        got = int(got_lo[j]) | (int(got_hi[j]) << 32)
        if got != want:
            bad += 1
    print(f"2^{max_log2} coset FFT: {16 - bad}/16 spot checks pass; "
          f"cold {t_fft:.1f}s warm {t_warm:.3f}s "
          f"({n / t_warm / 1e6:.0f} Melem/s)", flush=True)
    if bad:
        sys.exit(1)

    # -- 3. 2^26 roundtrip (inverse kernel config at n1=8192) --------------
    vals = np.random.default_rng(1).integers(0, P, size=n, dtype=np.uint64)
    lo, hi = fd.pack_np(vals)
    v = (jnp.asarray(lo), jnp.asarray(hi))
    t0 = time.perf_counter()
    rt = dom.ifft_fp(dom.fft_fp(v))
    _ = int(rt[0][0])
    t_rt = time.perf_counter() - t0
    idxs = np.random.default_rng(2).integers(0, n, size=64)
    ok = (np.array_equal(np.asarray(rt[0][jnp.asarray(idxs)]), lo[idxs])
          and np.array_equal(np.asarray(rt[1][jnp.asarray(idxs)]), hi[idxs]))
    print(f"2^{max_log2} fft+ifft roundtrip: {'MATCH' if ok else 'MISMATCH'} "
          f"(cold {t_rt:.1f}s)", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
