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


# Groups per block for the hybrid kernel: per (8, 512) vreg group the
# Montgomery trick costs ~3 muls/element of prefix/suffix work and shares
# ONE Fermat chain (~95 muls) across K groups — (3K + 95)/K muls/element
# vs 95 for plain Fermat: ~6.4x less VPU work at K = 16.
HYBRID_K = 16


def _inv_fp_hybrid_kernel(lo_ref, hi_ref, out_lo, out_hi):
    """Batched inverse, Montgomery-trick-in-registers: the block holds
    K groups of (8, 512) lanes; a running product chains the groups, one
    Fermat inversion of the final product is shared, and a backward pass
    peels per-group inverses.  Zeros map to 0 (masked to 1 through the
    product so they don't zero everything, as plain Fermat does naturally)."""
    K = HYBRID_K
    xs, zmasks = [], []
    for i in range(K):
        x = (lo_ref[8 * i:8 * (i + 1), :], hi_ref[8 * i:8 * (i + 1), :])
        z = (x[0] == 0) & (x[1] == 0)
        one = (jnp.ones_like(x[0]), jnp.zeros_like(x[1]))
        xs.append(fd.select(z, one, x))
        zmasks.append(z)
    prefix = [xs[0]]
    for i in range(1, K):
        prefix.append(fd.mul_lazy(prefix[-1], xs[i]))
    t = fd.inv(prefix[-1])  # canonical; fd ops accept representatives
    for i in range(K - 1, -1, -1):
        inv_i = fd.mul(t, prefix[i - 1]) if i > 0 else fd.canonicalize(t)
        if i > 0:
            t = fd.mul_lazy(t, xs[i])
        zero = (jnp.zeros_like(inv_i[0]), jnp.zeros_like(inv_i[1]))
        r = fd.select(zmasks[i], zero, inv_i)
        out_lo[8 * i:8 * (i + 1), :] = r[0]
        out_hi[8 * i:8 * (i + 1), :] = r[1]


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_hybrid(arrs, *, interpret=False):
    rows = arrs[0].shape[0]
    br = BLOCK_R * HYBRID_K
    vspec = pl.BlockSpec((br, BLOCK_C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _inv_fp_hybrid_kernel,
        grid=(rows // br,),
        in_specs=[vspec, vspec],
        out_specs=(vspec, vspec),
        out_shape=tuple(jax.ShapeDtypeStruct(arrs[0].shape, jnp.uint32)
                        for _ in range(2)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*arrs)


def inv_fp_pallas(a: fd.Fp2, interpret: bool = False) -> fd.Fp2:
    shape = a[0].shape
    n = a[0].size
    rows = n // BLOCK_C
    arrs = (a[0].reshape(rows, BLOCK_C), a[1].reshape(rows, BLOCK_C))
    if rows % (BLOCK_R * HYBRID_K) == 0:
        out = _run_hybrid(arrs, interpret=interpret)
    else:
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
