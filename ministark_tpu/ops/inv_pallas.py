"""Pallas TPU kernels: batched field inversion.

The scan-based Montgomery batch inverse (fields/device.py batch_inv) costs
~2*log2(n) full-array passes — every pass is an HBM round-trip on TPU since
XLA doesn't fuse uint32 chains.  Elementwise Fermat inversion (a^(p-2) by
addchain, ~100 muls) is embarrassingly parallel and runs entirely in VMEM:
ONE HBM read + write regardless of n.  Results are identical (the inverse
mod p is unique; 0 maps to 0 under Fermat).

Ext3 inversion reduces to elementwise work + one base inversion via the
norm map (fields/device.py ext3_batch_inv docstring), so it's the same
kernel shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import device as fd

BLOCK_R = 8
BLOCK_C = 512
TILE = BLOCK_R * BLOCK_C


def _inv_fp_kernel(lo_ref, hi_ref, out_lo, out_hi):
    r = fd.inv((lo_ref[:], hi_ref[:]))
    out_lo[:] = r[0]
    out_hi[:] = r[1]


def _inv_ext3_kernel(l0, h0, l1, h1, l2, h2, o0, o1, o2, o3, o4, o5):
    r = fd.ext3_inv(((l0[:], h0[:]), (l1[:], h1[:]), (l2[:], h2[:])))
    for ref, val in zip((o0, o1, o2, o3, o4, o5),
                        [p for comp in r for p in comp]):
        ref[:] = val


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _run(arrays, *, n_out, interpret=False):
    kernel = _inv_fp_kernel if n_out == 2 else _inv_ext3_kernel
    rows = arrays[0].shape[0]
    vspec = pl.BlockSpec((BLOCK_R, BLOCK_C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // BLOCK_R,),
        in_specs=[vspec] * len(arrays),
        out_specs=tuple([vspec] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct(arrays[0].shape, jnp.uint32)
                        for _ in range(n_out)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*arrays)


def eligible(shape) -> bool:
    n = 1
    for d in shape:
        n *= int(d)
    return n % TILE == 0


def inv_fp_pallas(a: fd.Fp2, interpret: bool = False) -> fd.Fp2:
    shape = a[0].shape
    n = a[0].size
    rows = n // BLOCK_C
    arrs = (a[0].reshape(rows, BLOCK_C), a[1].reshape(rows, BLOCK_C))
    out = _run(arrs, n_out=2, interpret=interpret)
    return (out[0].reshape(shape), out[1].reshape(shape))


def inv_ext3_pallas(a: fd.Ext3, interpret: bool = False) -> fd.Ext3:
    shape = a[0][0].shape
    n = a[0][0].size
    rows = n // BLOCK_C
    arrs = tuple(p.reshape(rows, BLOCK_C) for comp in a for p in comp)
    out = _run(arrs, n_out=6, interpret=interpret)
    return tuple((out[2 * k].reshape(shape), out[2 * k + 1].reshape(shape))
                 for k in range(3))
