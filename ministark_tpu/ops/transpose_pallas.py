"""Pallas TPU kernel: tiled per-batch 2-D transpose of u32 limb planes.

XLA:TPU's own u32 transpose runs at ~10 GB/s effective on the measured
chip (3.2 ms for a 2048x2048 limb pair — benches/ntt_ablate.py), ~30x off
the HBM roofline, and is the single largest cost in the six-step NTT
pipeline.  This kernel moves (tr, tc) tiles through VMEM and transposes
them in-register (Mosaic's packed transpose); the block index maps do the
tile-level swap, and the batch axis (trace columns riding along the lane
dimension, layout (R, B*C)) is walked by the grid — every block stays 2-D
and fully tiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _tr2_kernel(a_ref, b_ref, oa_ref, ob_ref):
    oa_ref[:] = jnp.transpose(a_ref[:])
    ob_ref[:] = jnp.transpose(b_ref[:])


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def transpose_mid(a, b, B: int = 1, interpret: bool = False):
    """(R, B*C) u32 limb pair -> (C, B*R): for each batch slice b (a
    contiguous lane range), transpose its (R, C) block — the six-step's
    inter-pass movement x[n1, b, n2] -> x[n2, b, n1] without the reshapes.
    R and C must be multiples of 128 (all six-step factors are)."""
    import math

    R, BC = a.shape
    C = BC // B
    tr = math.gcd(R, TILE)
    tc = math.gcd(C, TILE)
    assert R % tr == 0 and C % tc == 0 and tr % 8 == 0 and tc % 128 == 0, (
        R, C, tr, tc)
    grid = (B, R // tr, C // tc)
    ispec = pl.BlockSpec((tr, tc), lambda bb, i, j: (i, bb * (C // tc) + j),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((tc, tr), lambda bb, i, j: (j, bb * (R // tr) + i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _tr2_kernel,
        grid=grid,
        in_specs=[ispec, ispec],
        out_specs=(ospec, ospec),
        out_shape=(jax.ShapeDtypeStruct((C, B * R), jnp.uint32),
                   jax.ShapeDtypeStruct((C, B * R), jnp.uint32)),
        interpret=interpret,
    )(a, b)
