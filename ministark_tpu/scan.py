"""Affine prefix scans over the extension field.

Running permutation products and evaluation sums (BrainSTARK extension
columns, examples/brainfuck/trace.rs:108-289) and synthetic division are all
affine recurrences  s' = a*s + b;  on TPU they become log-depth
``lax.associative_scan`` over affine-map composition instead of the
reference's sequential CPU loops."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fields import device as fd


def _compose_lr(left, right):
    """(f ⊕ g)(x) = g(f(x)) for prefix scans: left map applies FIRST."""
    la, lb = left
    ra, rb = right
    a = fd.ext3_mul(tuple(ra), tuple(la))
    b = fd.ext3_add(fd.ext3_mul(tuple(ra), tuple(lb)), tuple(rb))
    return (a, b)


def affine_scan_ext3(a: fd.Ext3, b: fd.Ext3, init: fd.Ext3,
                     inclusive: bool) -> fd.Ext3:
    """Given per-step maps f_i(x) = a_i*x + b_i and an initial state:

    inclusive=True:  out[i] = f_i(f_{i-1}(...f_0(init)))   (state AFTER step i)
    inclusive=False: out[0] = init, out[i] = state BEFORE step i

    a, b: Ext3 arrays (n,); init: Ext3 scalars. Returns Ext3 (n,)."""
    comp = jax.lax.associative_scan(_compose_lr, (a, b), axis=a[0][0].ndim - 1)
    ca, cb = comp  # composition of f_0..f_i
    n = a[0][0].shape[-1]
    init_b = tuple(
        (jnp.broadcast_to(c[0], (n,)), jnp.broadcast_to(c[1], (n,))) for c in init)
    after = fd.ext3_add(fd.ext3_mul(tuple(tuple(x) for x in ca), init_b),
                        tuple(tuple(x) for x in cb))
    if inclusive:
        return after

    def shift_right(x, first):
        lo = jnp.concatenate([jnp.broadcast_to(first[0], (1,)).astype(fd.U32), x[0][:-1]])
        hi = jnp.concatenate([jnp.broadcast_to(first[1], (1,)).astype(fd.U32), x[1][:-1]])
        return (lo, hi)

    return tuple(
        shift_right(comp_k, (init[k][0], init[k][1]))
        for k, comp_k in enumerate(after))
