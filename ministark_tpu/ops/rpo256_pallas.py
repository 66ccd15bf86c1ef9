"""Pallas TPU kernel: RPO-256 permutation with hash instances across LANES.

The XLA path (ops/rpo256.py) issues each uint32 op as an HBM pass on this
TPU, and its x^(1/7) S-box alone is ~95 field muls per element — a 2^23-leaf
RPO tree measured 5.51 s (docs/RESULTS.md).  This kernel keeps the whole
7-round permutation in VMEM/registers:

  * state arrives LANE-MAJOR, shape (12, n) limb pairs — one hash instance
    per lane column, matching the (8, n) digest-word layout the SHA lanes
    path and the device Merkle trees already use (no transposes anywhere);
  * when n is a multiple of 1024 the instance axis splits (8, n/8) so every
    state row is a full (8, lanes) vreg block (ops/sha256_pallas.py pattern);
  * the MDS layer uses the matrix's CIRCULANT structure: with the state kept
    as 12 per-row registers, out[m] = sum_j first_row[j] * state[(m+j) % 12]
    needs no data movement at all — 16-bit limb splits make every product a
    single u32 madd (entries <= 26, sums < 2^25, no carries until the end);
  * the inverse S-box runs a 63-squaring/9-multiply addition chain
    (10540996611094048183 = ((((e7)^2 e6)^2)^2) * x^7 with e3..e7 the
    repeated-doubling accumulators) instead of the 95-op binary ladder;
  * everything chains LAZY mod-p representatives (fields/device.py), one
    canonical fold on the way out;
  * round constants live in SMEM and are scalar-indexed per (round, row), so
    the 7 rounds run under fori_loop and the compiled kernel stays small.

Parity: hash_rpo._permute / the reference's Metal RPO kernels
(gpu/src/metal/hash_shaders.h.metal, gpu/src/plan.rs:32-174); pinned by
interpret-mode tests against the host scalar implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import device as fd
from .rpo256 import (
    CAPACITY,
    DIGEST_SIZE,
    MDS_FIRST_ROW,
    NUM_ROUNDS,
    RATE,
    ROUND_CONSTANTS_0,
    ROUND_CONSTANTS_1,
    STATE_WIDTH,
)

import os

# Lanes per grid step (x8 sublanes on the packed path).  Measured on chip at
# 2^23 merges: 128 -> 1372 ms, 256 -> 2017 ms, 512 -> 2702 ms (bigger blocks
# spill the S-box chain's live temporaries); 64 is below Mosaic's minimum
# lane tile.
TILE = int(os.environ.get("MINISTARK_TPU_RPO_TILE", "128"))

_MDS_ROW = [np.uint32(c) for c in MDS_FIRST_ROW]
_MASK16 = np.uint32(0xFFFF)

# (NUM_ROUNDS, 12) u32 SMEM tables
_RC0_LO = (ROUND_CONSTANTS_0 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC0_HI = (ROUND_CONSTANTS_0 >> np.uint64(32)).astype(np.uint32)
_RC1_LO = (ROUND_CONSTANTS_1 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC1_HI = (ROUND_CONSTANTS_1 >> np.uint64(32)).astype(np.uint32)


def _mds_rc(lo, hi, rcl_ref, rch_ref, i):
    """MDS matrix-vector product + round-constant add, fused per state row.

    lo/hi: (12, ...) lazy u64 representatives.  Returns same shapes.  The
    row loop is pure Python indexing over register slices — the circulant
    structure turns the 12x12 product into scalar-constant madds."""
    # n:n+1 row slices keep everything >= 2-D (Mosaic-friendly); the leading
    # length-1 axis broadcasts through the madds and concatenates back to 12
    l0 = [lo[n:n + 1] & _MASK16 for n in range(STATE_WIDTH)]
    l1 = [lo[n:n + 1] >> 16 for n in range(STATE_WIDTH)]
    l2 = [hi[n:n + 1] & _MASK16 for n in range(STATE_WIDTH)]
    l3 = [hi[n:n + 1] >> 16 for n in range(STATE_WIDTH)]
    out_lo, out_hi = [], []
    for m in range(STATE_WIDTH):
        c0 = _MDS_ROW[0]
        n0 = m % STATE_WIDTH
        a0, a1 = c0 * l0[n0], c0 * l1[n0]
        a2, a3 = c0 * l2[n0], c0 * l3[n0]
        for j in range(1, STATE_WIDTH):
            c = _MDS_ROW[j]
            n = (m + j) % STATE_WIDTH
            a0 = a0 + c * l0[n]
            a1 = a1 + c * l1[n]
            a2 = a2 + c * l2[n]
            a3 = a3 + c * l3[n]
        # carry-propagate the 16-bit-limb accumulators (each < 2^25)
        t1 = a1 + (a0 >> 16)
        t2 = a2 + (t1 >> 16)
        t3 = a3 + (t2 >> 16)
        t4 = t3 >> 16  # < 2^9: the 2^64 overflow limb
        rlo = (a0 & _MASK16) | ((t1 & _MASK16) << 16)
        rhi = (t2 & _MASK16) | ((t3 & _MASK16) << 16)
        r = fd.reduce128_lazy(rlo, rhi, t4, jnp.zeros_like(t4))
        r = fd.add_lazy(r, (rcl_ref[i, m], rch_ref[i, m]))
        out_lo.append(r[0])
        out_hi.append(r[1])
    return jnp.concatenate(out_lo), jnp.concatenate(out_hi)


def _pow7(x):
    x2 = fd.mul_lazy(x, x)
    x3 = fd.mul_lazy(x2, x)
    x6 = fd.mul_lazy(x3, x3)
    return fd.mul_lazy(x6, x)


def _sqr_n(x, n):
    for _ in range(n):
        x = fd.mul_lazy(x, x)
    return x


def _pow_inv_alpha(x):
    """x^10540996611094048183 (the 1/7 exponent) in 63 squarings + 9 muls."""
    t1 = fd.mul_lazy(x, x)            # x^2
    t2 = fd.mul_lazy(t1, t1)          # x^4
    t3 = fd.mul_lazy(_sqr_n(t2, 3), t2)   # x^36
    t4 = fd.mul_lazy(_sqr_n(t3, 6), t3)   # x^2340
    t5 = fd.mul_lazy(_sqr_n(t4, 12), t4)
    t6 = fd.mul_lazy(_sqr_n(t5, 6), t3)
    t7 = fd.mul_lazy(_sqr_n(t6, 31), t6)
    a = _sqr_n(fd.mul_lazy(fd.mul_lazy(t7, t7), t6), 2)
    b = fd.mul_lazy(fd.mul_lazy(t1, t2), x)
    return fd.mul_lazy(a, b)


def _rpo_kernel(rc0l_ref, rc0h_ref, rc1l_ref, rc1h_ref, lo_ref, hi_ref,
                olo_ref, ohi_ref):
    lo = lo_ref[...]
    hi = hi_ref[...]

    def round_body(i, st):
        slo, shi = st
        slo, shi = _mds_rc(slo, shi, rc0l_ref, rc0h_ref, i)
        slo, shi = _pow7((slo, shi))
        slo, shi = _mds_rc(slo, shi, rc1l_ref, rc1h_ref, i)
        slo, shi = _pow_inv_alpha((slo, shi))
        return slo, shi

    lo, hi = jax.lax.fori_loop(0, NUM_ROUNDS, round_body, (lo, hi))
    lo, hi = fd.canonicalize((lo, hi))
    olo_ref[...] = lo
    ohi_ref[...] = hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute_lanes(lo, hi, interpret=False):
    """RPO permutation of lane-major state: lo/hi (12, n) u32 -> same."""
    n = lo.shape[1]
    rcs = (jnp.asarray(_RC0_LO), jnp.asarray(_RC0_HI),
           jnp.asarray(_RC1_LO), jnp.asarray(_RC1_HI))
    rc_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4

    if n % (8 * 128) == 0:
        # sublane-packed: (12, n) -> (12, 8, n/8) is a contiguous (free)
        # reshape; every state row becomes a full (8, lanes) vreg block
        m = n // 8
        tile = min(TILE, m)
        out = pl.pallas_call(
            _rpo_kernel,
            grid=(m // tile,),
            in_specs=rc_specs + [
                pl.BlockSpec((STATE_WIDTH, 8, tile), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((STATE_WIDTH, 8, tile),
                                    lambda j: (0, 0, j),
                                    memory_space=pltpu.VMEM)] * 2,
            out_shape=[jax.ShapeDtypeStruct((STATE_WIDTH, 8, m), jnp.uint32)] * 2,
            interpret=interpret,
        )(*rcs, lo.reshape(STATE_WIDTH, 8, m), hi.reshape(STATE_WIDTH, 8, m))
        return out[0].reshape(STATE_WIDTH, n), out[1].reshape(STATE_WIDTH, n)

    tile = min(TILE * 8, n)
    if n % tile != 0:
        tile = 128 if n % 128 == 0 else n
    out = pl.pallas_call(
        _rpo_kernel,
        grid=(n // tile,),
        in_specs=rc_specs + [
            pl.BlockSpec((STATE_WIDTH, tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((STATE_WIDTH, tile), lambda j: (0, j),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((STATE_WIDTH, n), jnp.uint32)] * 2,
        interpret=interpret,
    )(*rcs, lo, hi)
    return out


def hash_columns_lanes(cols, interpret=False):
    """RPO row-hash of a column-major matrix: cols = list of (n,) Fp limb
    pairs.  Returns (8, n) interleaved digest words [lo0,hi0,lo1,hi1,...]
    lane-major — the device Merkle tree layout.  Column-major absorb rule
    (8 columns per permutation; 1-then-zeros padding + capacity flag when
    ncols % 8 != 0), matching rpo256.hash_elements_batch."""
    ncols = len(cols)
    n = cols[0][0].shape[-1]
    padded = ncols % RATE != 0
    zero = jnp.zeros((n,), jnp.uint32)
    one = jnp.ones((n,), jnp.uint32)
    cap_lo = [one if padded else zero] + [zero] * (CAPACITY - 1)
    slo = None
    for start in range(0, ncols, RATE):
        chunk = cols[start:start + RATE]
        rate_lo = [c[0] for c in chunk]
        rate_hi = [c[1] for c in chunk]
        if len(chunk) < RATE:
            rate_lo += [one] + [zero] * (RATE - len(chunk) - 1)
            rate_hi += [zero] * (RATE - len(chunk))
        if slo is None:
            slo = jnp.stack(cap_lo + rate_lo)
            shi = jnp.stack([zero] * CAPACITY + rate_hi)
        else:
            slo = jnp.concatenate([slo[:CAPACITY], jnp.stack(rate_lo)])
            shi = jnp.concatenate([shi[:CAPACITY], jnp.stack(rate_hi)])
        slo, shi = permute_lanes(slo, shi, interpret=interpret)
    dlo = slo[CAPACITY:CAPACITY + DIGEST_SIZE]
    dhi = shi[CAPACITY:CAPACITY + DIGEST_SIZE]
    return jnp.stack([dlo, dhi], axis=1).reshape(2 * DIGEST_SIZE, n)


def merge_lanes(left, right, interpret=False):
    """Merkle merges: left/right (8, m) interleaved digest words -> (8, m)."""
    m = left.shape[1]
    zeros = jnp.zeros((CAPACITY, m), jnp.uint32)
    slo = jnp.concatenate([zeros, left[0::2], right[0::2]])
    shi = jnp.concatenate([zeros, left[1::2], right[1::2]])
    slo, shi = permute_lanes(slo, shi, interpret=interpret)
    dlo = slo[CAPACITY:CAPACITY + DIGEST_SIZE]
    dhi = shi[CAPACITY:CAPACITY + DIGEST_SIZE]
    return jnp.stack([dlo, dhi], axis=1).reshape(2 * DIGEST_SIZE, m)


def tree_levels_lanes_br(lanes, interpret=False):
    """All tree levels from (8, n) RPO leaf digest words in TREE-BITREV
    storage order (merkle.tree_levels_lanes_br semantics: siblings are
    contiguous halves, no strided lane slicing).  Device-resident levels."""
    levels = [lanes]
    cur = lanes
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        cur = merge_lanes(cur[:, :half], cur[:, half:], interpret=interpret)
        levels.append(cur)
    return levels
