"""Pallas TPU kernel: batched SHA-256 with messages across LANES.

The XLA path (ops/sha256.py) issues each uint32 op as an HBM pass (~128
passes per hash batch on the measured chip).  This kernel keeps the whole
compression in VMEM with hash instances vectorized across the lane axis:

  * input words arrive WORD-MAJOR, shape (W, n) — which is exactly what
    column-major field matrices produce without any transpose
    (word k of row i = byteswap(limb of column k//2 at position i));
  * the 64 rounds + message schedule run unrolled on vector registers;
  * when n is a multiple of 1024 the instance axis is split (8, n/8) so each
    word is a full (8, lanes) vreg block — a (1, n) row leaves 7 of 8
    sublanes dead in every vector op (~8x ALU waste); small batches (upper
    Merkle levels) keep the plain 2D layout.

Used for Merkle row-hashing and tree levels (reference counterparts:
src/merkle.rs:412-508 rayon loops, gpu hash kernels)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sha256 import _H0, _K, byteswap32

TILE = 512


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _const_schedule(block_words):
    """Message schedule of a fully-constant 16-word block, as 64 ints."""
    w = [int(x) for x in block_words]
    for t in range(16, 64):
        x15, x2 = w[t - 15], w[t - 2]
        s0 = (((x15 >> 7) | (x15 << 25)) ^ ((x15 >> 18) | (x15 << 14))
              ^ (x15 >> 3)) & 0xFFFFFFFF
        s1 = (((x2 >> 17) | (x2 << 15)) ^ ((x2 >> 19) | (x2 << 13))
              ^ (x2 >> 10)) & 0xFFFFFFFF
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & 0xFFFFFFFF)
    return w


def _sha_kernel(w_ref, o_ref, *, data_blocks, const_scheds):
    # 2D blocks carry one message per lane with a single active sublane —
    # 1/8 vreg utilization; 3D blocks (W, 8, lanes) pack 8 instances down the
    # sublane axis so every vector op runs on full (8, 128) registers.
    # Blocks past the data (pure padding: the 2nd block of every 64-byte
    # Merkle merge) have a compile-time-constant schedule: their w[t]+K[t]
    # fold to immediates and no VMEM rows are loaded for them.
    packed = len(w_ref.shape) == 3
    shape = w_ref.shape[1:] if packed else (1, w_ref.shape[1])

    def word(i):
        return w_ref[i] if packed else w_ref[i][None, :]

    state = [jnp.full(shape, np.uint32(h), jnp.uint32) for h in _H0]
    for b in range(data_blocks + len(const_scheds)):
        if b < data_blocks:
            w = [word(16 * b + t) for t in range(16)]
            for t in range(16, 64):
                s0 = (_rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18)
                      ^ (w[t - 15] >> 3))
                s1 = (_rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19)
                      ^ (w[t - 2] >> 10))
                w.append((w[t - 16] + s0 + w[t - 7] + s1).astype(jnp.uint32))
            kw = [np.uint32(_K[t]) + w[t] for t in range(64)]
        else:
            ws = const_scheds[b - data_blocks]
            kw = [np.uint32((int(_K[t]) + ws[t]) & 0xFFFFFFFF)
                  for t in range(64)]
        a, b_, c, d, e, f, g, h = state
        for t in range(64):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = g ^ (e & (f ^ g))          # == (e&f) ^ (~e&g), one op less
            t1 = (h + S1 + ch + kw[t]).astype(jnp.uint32)
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b_) | ((a | b_) & c)  # == majority, one op less
            t2 = (S0 + maj).astype(jnp.uint32)
            h, g, f, e, d, c, b_, a = g, f, e, (d + t1).astype(jnp.uint32), c, b_, a, (t1 + t2).astype(jnp.uint32)
        state = [(s + v).astype(jnp.uint32) for s, v in
                 zip(state, [a, b_, c, d, e, f, g, h])]
    for k in range(8):
        o_ref[k] = state[k] if packed else state[k][0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sha256_words_lanes(words, interpret=False):
    """SHA-256 of word-major messages: words (W, n) uint32 BE words, one
    message per lane column. Returns digests (8, n)."""
    W, n = words.shape
    total = ((W + 3 + 15) // 16) * 16
    bitlen = W * 32
    pad = np.zeros((total - W,), dtype=np.uint32)
    pad[0] = 0x80000000
    pad[-2] = (bitlen >> 32) & 0xFFFFFFFF
    pad[-1] = bitlen & 0xFFFFFFFF

    # Blocks wholly past the data are constants (every Merkle merge's 2nd
    # block): their schedules fold into the kernel; only `carried` rows of
    # padding ride along in VMEM with the data.
    data_total = 16 * ((W + 15) // 16)
    carried = data_total - W
    const_scheds = tuple(
        tuple(_const_schedule(pad[carried + 16 * b:carried + 16 * (b + 1)]))
        for b in range((total - data_total) // 16))
    if carried:
        msg = jnp.concatenate(
            [words, jnp.broadcast_to(jnp.asarray(pad[:carried, None]),
                                     (carried, n))], axis=0)
    else:
        msg = words
    total = data_total

    kernel = functools.partial(_sha_kernel, data_blocks=total // 16,
                               const_scheds=const_scheds)
    if n % (8 * 128) == 0:
        # sublane-packed path: split the instance axis into (8, n/8) so each
        # SHA word is a full-vreg (8, lanes) block instead of (1, n) slivers
        # with one live sublane.  The (total, n) -> (total, 8, n/8) reshape is
        # contiguous (free); input and output use the same split so digests
        # land back in instance order.
        m = n // 8
        tile = min(TILE, m)
        out = pl.pallas_call(
            kernel,
            grid=(m // tile,),
            in_specs=[pl.BlockSpec((total, 8, tile), lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 8, tile), lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 8, m), jnp.uint32),
            interpret=interpret,
        )(msg.reshape(total, 8, m))
        return out.reshape(8, n)

    tile = min(TILE, n)
    if n % tile != 0:
        tile = 128 if n % 128 == 0 else n
    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((total, tile), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, tile), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.uint32),
        interpret=interpret,
    )(msg)


def hash_rows_fp_lanes(cols_lo, cols_hi, interpret=False):
    """Row digests of an Fp matrix from stacked column limbs (ncols, n):
    returns (8, n) digest words — no transposes anywhere."""
    ncols, n = cols_lo.shape
    lo = byteswap32(cols_lo)
    hi = byteswap32(cols_hi)
    # interleave per column: [c0.lo, c0.hi, c1.lo, c1.hi, ...] along axis 0
    words = jnp.stack([lo, hi], axis=1).reshape(2 * ncols, n)
    return sha256_words_lanes(words, interpret=interpret)


def hash_rows_ext3_lanes(c0, c1, c2, interpret=False):
    """Row digests of an Fq3 matrix; each arg ((ncols,n) lo, hi).
    Element serialization c0||c1||c2, 8 LE bytes each."""
    ncols, n = c0[0].shape
    planes = []
    for comp in (c0, c1, c2):
        planes.append(byteswap32(comp[0]))
        planes.append(byteswap32(comp[1]))
    # per column: c0.lo c0.hi c1.lo c1.hi c2.lo c2.hi
    words = jnp.stack(planes, axis=1).reshape(6 * ncols, n)
    return sha256_words_lanes(words, interpret=interpret)


def merge_lanes(left, right, interpret=False):
    """Merkle merges: left/right (8, n) digest words -> (8, n)."""
    words = jnp.concatenate([left, right], axis=0)
    return sha256_words_lanes(words, interpret=interpret)


def build_tree_levels_lanes(leaf_words, interpret=False):
    """All tree levels from (8, n) leaf digest words (lane-major).
    Returns host numpy levels in the (n, 8) row-major layout that
    merkle.CommittedMerkleTree expects."""
    levels = [leaf_words]
    cur = leaf_words
    while cur.shape[1] > 1:
        cur = merge_lanes(cur[:, 0::2], cur[:, 1::2], interpret=interpret)
        levels.append(cur)
    return [np.asarray(jnp.transpose(l), dtype=np.uint32) for l in levels]
