"""Bit-reverse permutation strategies at LDE scale (the hidden cost inside
every fused commit program: digest perm at Merkle commit, eval bitrev at FRI
layer commit, and the six-step NTT's input gather).

Compares, at n = 2^23 on one chip:
  * flat:    jnp.take(x, brv_indices)           — one n-element gather
  * twostep: (x.reshape(n1,n2)[brv1].T)[brv2]    — two ROW gathers + a
             transpose (rows move contiguously; identity:
             bitrev_n(c*n1+d) = bitrev_n1(d)*n2 + bitrev_n2(c))
and the same for the (8, n) digest-permutation shape (perm on axis 1).

Run on the real chip (plain env): `python benches/bitrev.py`
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 23
CHAIN = 8
REPEATS = 5


def _time(fn, *args):
    import jax

    out = fn(*args)
    _ = int(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _i in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return min(times) / CHAIN


def main():
    import jax
    import jax.numpy as jnp

    from ministark_tpu.ntt import bit_reverse_indices

    log_n = N.bit_length() - 1
    n1 = 1 << (log_n // 2)
    n2 = N // n1
    brv = jnp.asarray(bit_reverse_indices(N))
    brv1 = jnp.asarray(bit_reverse_indices(n1))
    brv2 = jnp.asarray(bit_reverse_indices(n2))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, N, np.uint64).astype(np.uint32))

    @jax.jit
    def flat(x, brv):
        for _ in range(CHAIN):
            x = jnp.take(x, brv)
        return x

    @jax.jit
    def twostep(x, brv1, brv2):
        for _ in range(CHAIN):
            x = jnp.take(jnp.take(x.reshape(n1, n2), brv1, axis=0).T,
                         brv2, axis=0).reshape(N)
        return x

    # correctness first
    a = np.asarray(flat(x, brv))
    b = np.asarray(twostep(x, brv1, brv2))
    assert np.array_equal(a, b), "two-step bitrev mismatch"

    for name, fn, args in [("flat", flat, (x, brv)),
                           ("twostep", twostep, (x, brv1, brv2))]:
        dt = _time(fn, *args)
        print(json.dumps({"bench": "bitrev_1d", "variant": name, "n": N,
                          "ms": round(dt * 1e3, 3),
                          "gelem_s": round(N / dt / 1e9, 2)}), flush=True)

    # digest-permutation shape: (8, n) permuted along axis 1
    d = jnp.asarray(rng.integers(0, 1 << 32, (8, N), np.uint64)
                    .astype(np.uint32))

    @jax.jit
    def flat8(d, brv):
        for _ in range(CHAIN):
            d = jnp.take(d, brv, axis=1)
        return d

    @jax.jit
    def twostep8(d, brv1, brv2):
        for _ in range(CHAIN):
            y = d.reshape(8, n1, n2)
            y = jnp.take(y, brv1, axis=1)
            y = jnp.swapaxes(y, 1, 2)
            y = jnp.take(y, brv2, axis=1)
            d = y.reshape(8, N)
        return d

    a = np.asarray(flat8(d, brv))
    b = np.asarray(twostep8(d, brv1, brv2))
    assert np.array_equal(a, b), "two-step (8,n) bitrev mismatch"

    for name, fn, args in [("flat", flat8, (d, brv)),
                           ("twostep", twostep8, (d, brv1, brv2))]:
        dt = _time(fn, *args)
        print(json.dumps({"bench": "bitrev_8xn", "variant": name, "n": N,
                          "ms": round(dt * 1e3, 3),
                          "gelem_s": round(8 * N / dt / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
