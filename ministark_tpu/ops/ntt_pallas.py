"""Pallas TPU kernel: fused column-NTT (the six-step building block).

Measurement (v5e via axon): XLA executes each uint32 elementwise op as its
own HBM pass (~0.6ms/pass at 2^22) — a 22-stage radix-2 NTT costs hundreds
of passes.  This kernel performs ALL log2(n1) butterfly stages of a column
transform inside VMEM: one read + one write of the data per kernel, with the
optional six-step twiddle fold applied in the epilogue.

Two kernel variants:
  * `_col_ntt_kernel_unrolled` (default) — all log2(n1) stages unrolled as a
    Python loop in ONE grid step, using LAZY field arithmetic (mod-p
    representatives in [0, 2^64) across stages, canonicalized once at the
    end).  An early fully-unrolled variant with canonical ops OOMed the
    Mosaic VMEM stack at 2048 rows; the lazy rewrite needs far fewer
    temporaries per butterfly (no compare/select canonical reduction), and
    static roll shifts lower to fast Mosaic code, so it both fits and is
    ~1.6x faster.  Kept guarded by `UNROLL_MAX_N1` (proven on-chip sizes).
  * `_col_ntt_kernel` — one butterfly stage per grid step under a sequential
    grid (the output block is revisited so state lives in VMEM across
    stages), canonical ops with dynamic roll shifts:
        z      = T_s * (is_lo ? x[r+half] : x[r])
        out[r] = is_lo ? x[r] + z : x[r-half] - z
    Fallback for n1 beyond the unrolled kernel's proven range, and the A/B
    baseline in benches/ntt_variants.py.

Kernel shape rule learned the hard way: strided twiddle slices lower to
unsupported gathers -> per-stage twiddle VECTORS (log2(n1), n1) are
precomputed host-side.

Grid: tiles of TILE lanes along the batch (n2) axis.  Input rows must be
pre-bit-reversed along axis 0 (one XLA row-gather outside).

This is the reference's threadgroup-memory FFT stage
(gpu/src/metal/fft_shaders.h.metal:61-101 `FftMultiple`) scaled from a
threadgroup to a VMEM tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import device as fd
from ..fields.scalar import P

TILE = 128

# Largest n1 the unrolled kernel fits at on the chip: n1=8192 is a measured
# VMEM OOM (208M > 128M) — the (log_n, n1, 1) twiddle operand lane-pads its
# trailing dim to 128, costing 52 MB per limb plane at 8192.  Above this,
# col_ntt falls back to the per-stage fori_loop kernel (canonicalizing and
# applying `pre` outside), verified on chip by benches/ntt_unroll_range.py
# up to the 2^26-point coset LDE (n1 = 8192).
UNROLL_MAX_N1 = 4096


@functools.lru_cache(maxsize=64)
def stage_twiddles(root: int, n1: int):
    """Per-stage full twiddle vectors, packed LANE-MAJOR as (n1, 128):
    column s-1 holds T_s[r] = w^((n1/2^s) * (r mod 2^(s-1))) — the
    multiplier applied at row r in stage s (same value for a butterfly's lo
    and hi rows); columns >= log2(n1) are zero padding.

    Layout rationale (measured on chip): the previous (log_n, n1, 1) layout
    lane-padded every stage plane to 128 lanes — 52 MB of VMEM per limb at
    n1 = 8192, the dominant kernel allocation and an OOM beyond 4096.  One
    (n1, 128) block holds ALL stages in exactly one operand tile (4 MB at
    8192); the kernel slices column s statically and lane-broadcasts."""
    log_n = n1.bit_length() - 1
    assert log_n <= 128
    out_lo = np.zeros((n1, 128), np.uint32)
    out_hi = np.zeros((n1, 128), np.uint32)
    r_idx = np.arange(n1, dtype=np.int64)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        wm = pow(root, n1 // m, P)
        pw = np.ones(half, dtype=object)
        for j in range(1, half):
            pw[j] = pw[j - 1] * wm % P
        vals = np.array([int(pw[r % half]) for r in r_idx], dtype=np.uint64)
        out_lo[:, s - 1] = (vals & 0xFFFFFFFF).astype(np.uint32)
        out_hi[:, s - 1] = (vals >> 32).astype(np.uint32)
    # numpy (not jnp): this function is reached inside jit traces, and
    # caching trace-created jnp arrays leaks tracers
    return (out_lo, out_hi)


def _col_ntt_kernel(x_lo_ref, x_hi_ref, tw_lo_ref, tw_hi_ref,
                    tm_lo_ref, tm_hi_ref, _pm_lo_ref, _pm_hi_ref,
                    o_lo_ref, o_hi_ref, *, n1, with_tmat):
    """One butterfly stage per grid step along grid dim 1; the output block is
    revisited (sequential grid) so intermediate state lives in its VMEM
    block across stages."""
    log_n = n1.bit_length() - 1
    s = pl.program_id(1)  # 0-based stage index
    tile = x_lo_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.uint32, (n1, tile), 0)

    half = jnp.uint32(1) << s.astype(jnp.uint32)  # 2^s = m/2 for stage s+1
    is_lo = (rows & half) == 0
    T = (tw_lo_ref[:].reshape(n1, 1), tw_hi_ref[:].reshape(n1, 1))  # (1,n1,1) stage block

    def load(ref_pair):
        return (ref_pair[0][:], ref_pair[1][:])

    x = jax.lax.cond(
        s == 0,
        lambda: load((x_lo_ref, x_hi_ref)),
        lambda: load((o_lo_ref, o_hi_ref)),
    )
    shift = half.astype(jnp.int32)
    neg = (n1 - half).astype(jnp.int32)
    xp = (pltpu.roll(x[0], neg, axis=0), pltpu.roll(x[1], neg, axis=0))
    xm = (pltpu.roll(x[0], shift, axis=0), pltpu.roll(x[1], shift, axis=0))
    operand = fd.select(is_lo, xp, x)
    z = fd.mul(T, operand)
    out = fd.select(is_lo, fd.add(x, z), fd.sub(xm, z))

    if with_tmat:
        last = s == log_n - 1

        def with_fold():
            return fd.mul(out, (tm_lo_ref[:], tm_hi_ref[:]))

        out = jax.lax.cond(last, with_fold, lambda: out)

    o_lo_ref[:] = out[0]
    o_hi_ref[:] = out[1]


def _col_ntt_kernel_unrolled(x_lo_ref, x_hi_ref, tw_lo_ref, tw_hi_ref,
                             tm_lo_ref, tm_hi_ref, pm_lo_ref, pm_hi_ref,
                             o_lo_ref, o_hi_ref, *, n1, with_tmat, with_pre,
                             canon):
    """All log2(n1) stages unrolled in one grid step: static roll shifts
    (dynamic sublane rolls lower to much slower Mosaic code) and LAZY field
    arithmetic — butterfly values stay mod-p representatives in [0, 2^64)
    across stages and are canonicalized once on the way out.

    z = T * x is computed on every row; a pair's rows share the same T, so
    the lo-row's butterfly term T*x[r+half] is just z rolled by -half:
        out[r] = is_lo ? x[r] + z[r+half] : x[r-half] - z[r]

    `with_pre` folds an elementwise scale (the coset offset powers) in as a
    prologue; `canon=False` emits mod-p representatives (< 2^64) for
    kernels whose consumer is itself lazy (the second six-step pass)."""
    log_n = n1.bit_length() - 1
    tile = x_lo_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.uint32, (n1, tile), 0)
    x = (x_lo_ref[:], x_hi_ref[:])
    if with_pre:
        x = fd.mul_lazy(x, (pm_lo_ref[:], pm_hi_ref[:]))
    for s in range(log_n):
        half = 1 << s
        is_lo = (rows & jnp.uint32(half)) == 0
        T = (tw_lo_ref[:, s:s + 1], tw_hi_ref[:, s:s + 1])
        z = fd.mul_lazy(T, x)
        zp = (pltpu.roll(z[0], n1 - half, axis=0),
              pltpu.roll(z[1], n1 - half, axis=0))
        xm = (pltpu.roll(x[0], half, axis=0),
              pltpu.roll(x[1], half, axis=0))
        x = fd.select(is_lo, fd.add_lazy(x, zp), fd.sub_lazy(xm, z))
    if with_tmat:
        x = fd.mul_lazy(x, (tm_lo_ref[:], tm_hi_ref[:]))
    if canon:
        x = fd.canonicalize(x)
    o_lo_ref[:] = x[0]
    o_hi_ref[:] = x[1]


def _col_ntt_xla(x, tw_stages, tmat, pre, n1: int, period: int):
    """Plain-XLA column NTT with col_ntt's exact call contract (bit-reversed
    input rows, per-stage twiddle vectors, optional cycling pre/tmat folds).
    Fallback for n1 beyond the Pallas kernels' VMEM range."""
    L = x[0].shape[1]
    k = L // period
    log_n = n1.bit_length() - 1
    x = fd.canonicalize(x)

    def bcast_mul(arr, mat):
        xs = (arr[0].reshape(n1, k, period), arr[1].reshape(n1, k, period))
        mb = (mat[0][:, None, :], mat[1][:, None, :])
        out = fd.mul(xs, mb)
        return (out[0].reshape(n1, L), out[1].reshape(n1, L))

    if pre is not None:
        x = bcast_mul(x, pre)
    for s in range(log_n):
        m = 2 << s
        half = 1 << s
        tws = (tw_stages[0][:half, s].reshape(1, half, 1),
               tw_stages[1][:half, s].reshape(1, half, 1))
        xs = (x[0].reshape(n1 // m, 2, half, L),
              x[1].reshape(n1 // m, 2, half, L))
        u = (xs[0][:, 0], xs[1][:, 0])
        v = fd.mul((xs[0][:, 1], xs[1][:, 1]), tws)
        lo_half = fd.add(u, v)
        hi_half = fd.sub(u, v)
        x = (jnp.stack([lo_half[0], hi_half[0]], axis=1).reshape(n1, L),
             jnp.stack([lo_half[1], hi_half[1]], axis=1).reshape(n1, L))
    if tmat is not None:
        x = bcast_mul(x, tmat)
    return x


@functools.partial(jax.jit, static_argnames=("interpret", "unrolled", "canon",
                                              "lane_period"))
def col_ntt(x, tw_stages, tmat=None, pre=None, interpret=False, unrolled=True,
            canon=True, lane_period=None):
    """Column NTT over axis 0 of (n1, L) limb pairs.

    `x` must already be bit-reversed along axis 0; `tw_stages` = per-stage
    twiddle vectors from `stage_twiddles`; `tmat` (optional) = (n1, n2)
    six-step twiddle matrix folded into the output; `pre` (optional) =
    (n1, n2) elementwise scale applied before the stages (coset offsets).

    BATCHING: the lane axis may carry several independent columns packed as
    L = ncols * n2.  `lane_period` (= n2, static) makes the tmat/pre blocks
    cycle per column via the BlockSpec index map, so ONE kernel pipeline
    transforms all columns (gpu/src/plan.rs's batch-planner role).  With
    `lane_period=None` tmat/pre must span the full lane width.

    Inputs may be mod-p representatives in [0, 2^64); `canon=False` keeps
    the output in representative form too (unrolled path only)."""
    n1, L = x[0].shape
    tile = min(TILE, L)
    assert L % tile == 0
    period = lane_period if lane_period is not None else L
    assert L % period == 0 and period % tile == 0, (L, period, tile)
    pp = period // tile  # tmat/pre blocks per column
    with_tmat = tmat is not None
    with_pre = pre is not None
    if with_tmat:
        assert tmat[0].shape == (n1, period), (tmat[0].shape, n1, period)
    if with_pre:
        assert pre[0].shape == (n1, period), (pre[0].shape, n1, period)
    if n1 > UNROLL_MAX_N1:
        # Beyond the Pallas kernels' VMEM range (measured on chip at
        # n1 = 8192: the unrolled kernel OOMs on the lane-padded
        # (log_n, n1, 1) twiddle windows, and the fori_loop kernel OOMs on
        # 121 MB of register spill slots from its dynamic rolls).  Fall
        # back to plain XLA butterfly stages — one HBM pass per op, but
        # correct at any size; this path only runs for transforms over
        # 2^24 points (n1 > 4096 after the balanced six-step split).
        return _col_ntt_xla(x, tw_stages, tmat, pre, n1, period)
    assert canon or unrolled
    assert pre is None or unrolled
    dummy = (jnp.zeros((8, 128), fd.U32), jnp.zeros((8, 128), fd.U32))
    if tmat is None:
        tmat = dummy  # tiny dummy operand (never read)
    if pre is None:
        pre = dummy

    log_n = n1.bit_length() - 1
    tw_in = tw_stages
    if unrolled:
        grid = (L // tile,)
        xspec = pl.BlockSpec((n1, tile), lambda j: (0, j), memory_space=pltpu.VMEM)
        tmspec = (pl.BlockSpec((n1, tile), lambda j: (0, j % pp),
                               memory_space=pltpu.VMEM)
                  if with_tmat else
                  pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM))
        twspec = pl.BlockSpec((n1, 128), lambda j: (0, 0),
                              memory_space=pltpu.VMEM)
        pmspec = (pl.BlockSpec((n1, tile), lambda j: (0, j % pp),
                               memory_space=pltpu.VMEM)
                  if with_pre else
                  pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM))
        kernel = functools.partial(_col_ntt_kernel_unrolled, n1=n1,
                                   with_tmat=with_tmat, with_pre=with_pre,
                                   canon=canon)
    else:
        # the per-stage-block kernel wants stage planes (log_n, n1, 1):
        # unpack the packed (n1, 128) table outside the kernel (tiny)
        tw_in = tuple(jnp.transpose(t[:, :log_n])[:, :, None]
                      for t in tw_stages)
        grid = (L // tile, log_n)
        xspec = pl.BlockSpec((n1, tile), lambda j, s: (0, j), memory_space=pltpu.VMEM)
        tmspec = (pl.BlockSpec((n1, tile), lambda j, s: (0, j % pp),
                               memory_space=pltpu.VMEM)
                  if with_tmat else
                  pl.BlockSpec((8, 128), lambda j, s: (0, 0), memory_space=pltpu.VMEM))
        twspec = pl.BlockSpec((1, n1, 1), lambda j, s: (s, 0, 0),
                              memory_space=pltpu.VMEM)
        pmspec = pl.BlockSpec((8, 128), lambda j, s: (0, 0),
                              memory_space=pltpu.VMEM)
        kernel = functools.partial(_col_ntt_kernel, n1=n1, with_tmat=with_tmat)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xspec, xspec, twspec, twspec, tmspec, tmspec,
                  pmspec, pmspec],
        out_specs=(xspec, xspec),
        out_shape=(jax.ShapeDtypeStruct((n1, L), jnp.uint32),
                   jax.ShapeDtypeStruct((n1, L), jnp.uint32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x[0], x[1], tw_in[0], tw_in[1], tmat[0], tmat[1],
      pre[0], pre[1])
    return out
