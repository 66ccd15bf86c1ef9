"""Affine prefix scans over the extension field.

Running permutation products and evaluation sums (BrainSTARK extension
columns, examples/brainfuck/trace.rs:108-289) are affine recurrences
s' = a*s + b; on TPU they become log-depth Hillis-Steele composition passes
instead of the reference's sequential CPU loops.  (Hillis-Steele shifted
multiplies rather than lax.associative_scan: the scan's unrolled lowering is
~5x larger in HLO and XLA compile time is superlinear in graph size.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fields import device as fd


def _shift_right_ext3(x: fd.Ext3, k: int, fill=(1, 0, 0)) -> fd.Ext3:
    out = []
    for comp, f in zip(x, fill):
        lo, hi = comp
        n = lo.shape[-1]
        pad_lo = jnp.full((k,), f & 0xFFFFFFFF, fd.U32)
        pad_hi = jnp.full((k,), f >> 32, fd.U32)
        out.append((jnp.concatenate([pad_lo, lo[..., : n - k]], -1),
                    jnp.concatenate([pad_hi, hi[..., : n - k]], -1)))
    return tuple(out)


def affine_scan_ext3(a: fd.Ext3, b: fd.Ext3, init: fd.Ext3,
                     inclusive: bool) -> fd.Ext3:
    """Given per-step maps f_i(x) = a_i*x + b_i and an initial state:

    inclusive=True:  out[i] = f_i(f_{i-1}(...f_0(init)))   (state AFTER step i)
    inclusive=False: out[0] = init, out[i] = state BEFORE step i

    a, b: Ext3 arrays (n,); init: Ext3 scalars. Returns Ext3 (n,).

    Hillis-Steele over affine composition: with (A_i, B_i) the composition of
    f_{i-2^k+1..i}, one pass computes compositions of twice the span:
        (A, B)_i <- (A_i * A_{i-2^k},  A_i * B_{i-2^k} + B_i)

    On the CPU backend a sequential lax.scan is used instead: its body
    compiles once (~10^3 HLO) versus the log(n) unrolled passes, and test
    sizes make the sequential runtime irrelevant.  Results are identical.
    """
    if jax.default_backend() == "cpu":
        return _affine_scan_sequential(a, b, init, inclusive)
    n = a[0][0].shape[-1]
    A, B = a, b
    k = 1
    while k < n:
        A_prev = _shift_right_ext3(A, k, fill=(1, 0, 0))
        B_prev = _shift_right_ext3(B, k, fill=(0, 0, 0))
        B = fd.ext3_add(fd.ext3_mul(A, B_prev), B)
        A = fd.ext3_mul(A, A_prev)
        # barrier per level: without it XLA fuses the doubling chain into its
        # consumers and recomputes it per element (see fields/device.py)
        A, B = jax.lax.optimization_barrier((A, B))
        k *= 2

    init_b = tuple(
        (jnp.broadcast_to(c[0], (n,)), jnp.broadcast_to(c[1], (n,))) for c in init)
    after = fd.ext3_add(fd.ext3_mul(A, init_b), B)
    if inclusive:
        return after

    def shift1(x, first):
        lo = jnp.concatenate([jnp.broadcast_to(first[0], (1,)).astype(fd.U32),
                              x[0][:-1]])
        hi = jnp.concatenate([jnp.broadcast_to(first[1], (1,)).astype(fd.U32),
                              x[1][:-1]])
        return (lo, hi)

    return tuple(
        shift1(comp, (init[k_][0], init[k_][1]))
        for k_, comp in enumerate(after))


def _affine_scan_sequential(a: fd.Ext3, b: fd.Ext3, init: fd.Ext3,
                            inclusive: bool) -> fd.Ext3:
    n = a[0][0].shape[-1]

    def step(state, ab):
        ai, bi = ab
        new = fd.ext3_add(fd.ext3_mul(tuple(ai), state), tuple(bi))
        return new, (new if inclusive else state)

    init_state = tuple((jnp.reshape(c[0], ()), jnp.reshape(c[1], ())) for c in init)
    # stack per-index elements along axis 0 for scan
    xs = (a, b)
    _, out = jax.lax.scan(step, init_state, xs)
    return tuple(tuple(x) for x in out)
