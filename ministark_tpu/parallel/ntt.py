"""Distributed six-step NTT over a TPU mesh axis.

No reference counterpart (the reference is single-device; SURVEY.md §2.5-2.7
derives what multi-chip must look like).  The classic distributed FFT maps
perfectly onto the six-step decomposition already used on one chip
(ntt.py:_ntt_core): view x as an (n1, n2) matrix M[j1, j2] = x[j1*n2 + j2],
then

  1. all_to_all: contiguous (row) shard -> column shard   [ICI]
  2. local column NTT along j1 of the (n1, n2/d) slab     [VPU/Pallas]
  3. local multiply by the six-step twiddle slice T[k1, j2]
  4. all_to_all transpose -> (n2, n1/d) slab               [ICI]
  5. local column NTT along j2
  6. all_to_all transpose of D[k2, k1] -> contiguous natural-order shard

Each chip's local pass reuses the single-chip stages (XLA path on CPU
meshes, the fused Pallas kernel on TPU).  Communication is three
all-to-alls of n/d elements each — the optimal volume for a transposed FFT.

Tables (coset scale, six-step twiddles) are passed as *sharded operands*,
never baked as constants: at 2^24 points they are hundreds of MB of HLO
literal otherwise (ntt.py learned this the hard way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import device as fd
from ..fields.scalar import P
from ..ntt import (
    Domain,
    _dit_stages_axis0,
    _ext3_mul_tw,
    _fp_mul_tw,
    _split_n,
    bit_reverse_indices,
)


# ---------------------------------------------------------------------------
# host-side table construction (numpy, cached)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _powers_np(base: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = acc * base % P
    return out


def _pack2(vals: np.ndarray):
    return ((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (vals >> np.uint64(32)).astype(np.uint32))


@functools.lru_cache(maxsize=64)
def _sixstep_tmat_np(n: int, root: int):
    """T[k1, j2] = root^(k1*j2), shape (n1, n2) uint32 limb pair."""
    n1, n2 = _split_n(n)
    w = _powers_np(root, n)
    k1 = np.arange(n1, dtype=np.uint64)[:, None]
    j2 = np.arange(n2, dtype=np.uint64)[None, :]
    idx = (k1 * j2) % n
    return _pack2(w[idx])


@functools.lru_cache(maxsize=64)
def _scale_np(offset: int, n: int):
    return _pack2(_powers_np(offset, n))


# ---------------------------------------------------------------------------
# per-chip local column NTT (axis 0), batch trailing
# ---------------------------------------------------------------------------

def _local_col_ntt(x, n1: int, root_pow: int, mul_tw, add_op, sub_op):
    """Full column NTT along axis 0 of (n1, cols) leaves.

    `root_pow` = the primitive n1-th root (host int).  Uses the fused Pallas
    kernel on TPU (per Fp component — ext3 butterflies are component-wise
    since twiddles live in the base field); the XLA stage loop on CPU."""
    perm = bit_reverse_indices(n1)
    x = jax.tree.map(lambda t: jnp.take(t, jnp.asarray(perm), axis=0), x,
                     is_leaf=lambda t: isinstance(t, jnp.ndarray))

    n2_local = jax.tree.leaves(x)[0].shape[1]
    use_pallas = (jax.default_backend() not in ("cpu",) and n1 >= 16
                  and n2_local % 128 == 0)
    if use_pallas:
        from ..ops import ntt_pallas

        tw_stages = ntt_pallas.stage_twiddles(root_pow % P, n1)
        tw_dev = (jnp.asarray(tw_stages[0]), jnp.asarray(tw_stages[1]))
        if isinstance(x[0], tuple):  # ext3: three independent Fp transforms
            return tuple(ntt_pallas.col_ntt(c, tw_dev) for c in x)
        return ntt_pallas.col_ntt(x, tw_dev)

    tw_np = _pack2(_powers_np(root_pow % P, max(n1 // 2, 1)))
    tw = (jnp.asarray(tw_np[0]), jnp.asarray(tw_np[1]))
    return _dit_stages_axis0(x, tw, n1, mul_tw, add_op, sub_op)


# ---------------------------------------------------------------------------
# the sharded transform
# ---------------------------------------------------------------------------

class ShardedDomain:
    """Coset evaluation domain whose transforms run sharded over `axis`.

    The per-chip building blocks (`fft_fp_local`, `ifft_fp_local`, ext3
    variants) are meant to be called INSIDE a `shard_map` whose mesh carries
    `axis`; `fft_fp` / `ifft_fp` wrap them into standalone jitted programs.
    Inputs/outputs are (n,) vectors sharded contiguously (natural order).
    """

    def __init__(self, mesh, size: int, offset: int = 1, axis: str = "col"):
        self.mesh = mesh
        self.axis = axis
        self.d = int(mesh.devices.size)
        self.dom = Domain(size, offset)
        self.n = size
        self.n1, self.n2 = _split_n(size)
        assert self.n2 % self.d == 0 and self.n1 % self.d == 0, (
            "mesh axis must divide both six-step factors")

    # -- table operands (host numpy; caller device_puts via shard_spec) ------

    def fwd_tables_np(self):
        """(tmat, scale) numpy limb pairs, each shaped (n,) in the layout the
        local functions expect; shard both with PartitionSpec(axis)."""
        tmat = _sixstep_tmat_np(self.n, self.dom.group_gen)
        # pass 1 sees column shards of M: T[k1, j2] sharded over j2 = axis 1.
        # We ship it TRANSPOSED + flattened so a contiguous 1-D shard of the
        # flat vector equals the (n1, n2/d) local slice (transposed back
        # locally).
        tmat_t = (np.ascontiguousarray(tmat[0].T).reshape(-1),
                  np.ascontiguousarray(tmat[1].T).reshape(-1))
        scale = (_scale_np(self.dom.offset, self.n)
                 if self.dom.offset != 1 else None)
        return tmat_t, scale

    def inv_tables_np(self):
        tmat = _sixstep_tmat_np(self.n, self.dom.group_gen_inv)
        tmat_t = (np.ascontiguousarray(tmat[0].T).reshape(-1),
                  np.ascontiguousarray(tmat[1].T).reshape(-1))
        unscale = (_scale_np(self.dom.offset_inv, self.n)
                   if self.dom.offset != 1 else None)
        return tmat_t, unscale

    # -- per-chip passes ------------------------------------------------------

    def _pipeline(self, x, tmat_t_local, root: int, mul_tw, add_op, sub_op,
                  pre_scale=None, post_scale=None):
        """Core distributed six-step on (n/d,)-leaf pytrees inside shard_map.

        pre_scale / post_scale: local (n/d,) Fp2 multipliers (coset scale and
        1/n-unscale), applied in natural contiguous order.
        """
        n, n1, n2, d, ax = self.n, self.n1, self.n2, self.d, self.axis

        if pre_scale is not None:
            x = mul_tw(x, pre_scale)

        # 1) contiguous (j1-block) shard -> j2 shard: local (n1/d, n2),
        #    split j2 into d chunks, all_to_all, reassemble rows.
        def to_cols(t):
            t = t.reshape(n1 // d, d, n2 // d)          # [j1_loc, dst, j2_loc]
            t = jnp.moveaxis(t, 1, 0)                    # [dst, j1_loc, j2_loc]
            t = jax.lax.all_to_all(t, ax, 0, 0, tiled=False)
            # now [src, j1_loc, j2_loc] where src = origin chip = j1 block
            return t.reshape(n1, n2 // d)
        x = jax.tree.map(to_cols, x,
                         is_leaf=lambda v: isinstance(v, jnp.ndarray))

        # 2) local column NTT along j1 (full columns, n2/d of them)
        x = _local_col_ntt(x, n1, pow(root, n2, P), mul_tw, add_op, sub_op)

        # 3) six-step twiddle: local slice (n1, n2/d) from the transposed
        #    flat operand (n2/d, n1) -> transpose back
        tm = (tmat_t_local[0].reshape(n2 // d, n1).T,
              tmat_t_local[1].reshape(n2 // d, n1).T)
        x = mul_tw(x, tm)

        # 4) all_to_all transpose: (n1, n2/d) -> (n2, n1/d)
        def transpose1(t):
            t = t.reshape(d, n1 // d, n2 // d)           # [dst(k1 blk), k1_loc, j2_loc]
            t = jax.lax.all_to_all(t, ax, 0, 0, tiled=False)
            # [src(=j2 blk), k1_loc, j2_loc] -> rows j2 = src*n2/d + j2_loc
            t = jnp.moveaxis(t, 1, 2).reshape(n2, n1 // d)
            return t
        x = jax.tree.map(transpose1, x,
                         is_leaf=lambda v: isinstance(v, jnp.ndarray))

        # 5) local column NTT along j2
        x = _local_col_ntt(x, n2, pow(root, n1, P), mul_tw, add_op, sub_op)

        # 6) final transpose: D[k2, k1_loc] -> natural contiguous
        #    out[k] = D[k2, k1], k = k2*n1 + k1; chip owns k2 block.
        def transpose2(t):
            t = t.reshape(d, n2 // d, n1 // d)           # [dst(k2 blk), k2_loc, k1_loc]
            t = jax.lax.all_to_all(t, ax, 0, 0, tiled=False)
            # [src(=k1 blk), k2_loc, k1_loc] -> k = k2*n1 + src*n1/d + k1_loc
            t = jnp.moveaxis(t, 0, 1).reshape(n2 // d, n1)
            return t.reshape(n // d)
        x = jax.tree.map(transpose2, x,
                         is_leaf=lambda v: isinstance(v, jnp.ndarray))

        if post_scale is not None:
            x = mul_tw(x, post_scale)
        return x

    # Fp -----------------------------------------------------------------

    def fft_fp_local(self, x: fd.Fp2, tmat_t_local, scale_local=None) -> fd.Fp2:
        return self._pipeline(x, tmat_t_local, self.dom.group_gen,
                              _fp_mul_tw, fd.add, fd.sub,
                              pre_scale=scale_local)

    def ifft_fp_local(self, x: fd.Fp2, tmat_t_local, unscale_local=None) -> fd.Fp2:
        out = self._pipeline(x, tmat_t_local, self.dom.group_gen_inv,
                             _fp_mul_tw, fd.add, fd.sub)
        out = fd.mul(out, fd.full(out[0].shape, self.dom.size_inv))
        if unscale_local is not None:
            out = fd.mul(out, unscale_local)
        return out

    # Ext3 ---------------------------------------------------------------

    def fft_ext3_local(self, x: fd.Ext3, tmat_t_local, scale_local=None) -> fd.Ext3:
        return self._pipeline(x, tmat_t_local, self.dom.group_gen,
                              _ext3_mul_tw, fd.ext3_add, fd.ext3_sub,
                              pre_scale=scale_local)

    def ifft_ext3_local(self, x: fd.Ext3, tmat_t_local, unscale_local=None) -> fd.Ext3:
        out = self._pipeline(x, tmat_t_local, self.dom.group_gen_inv,
                             _ext3_mul_tw, fd.ext3_add, fd.ext3_sub)
        out = fd.ext3_mul_base(out, fd.full(out[0][0].shape, self.dom.size_inv))
        if unscale_local is not None:
            out = fd.ext3_mul_base(out, unscale_local)
        return out

    # -- standalone jitted wrappers ------------------------------------------

    def _wrap(self, kind: str):
        from jax.sharding import NamedSharding, PartitionSpec as PSpec

        mesh, ax = self.mesh, self.axis
        sh = NamedSharding(mesh, PSpec(ax))
        fwd = kind.startswith("fft")
        tmat_t, scale = (self.fwd_tables_np() if fwd else self.inv_tables_np())
        tmat_dev = tuple(jax.device_put(t, sh) for t in tmat_t)
        scale_dev = (tuple(jax.device_put(t, sh) for t in scale)
                     if scale is not None else None)
        local = {
            "fft_fp": self.fft_fp_local, "ifft_fp": self.ifft_fp_local,
            "fft_ext3": self.fft_ext3_local, "ifft_ext3": self.ifft_ext3_local,
        }[kind]

        vec = PSpec(ax)  # PartitionSpec prefix: applies to every leaf
        from .. import runtime

        if scale_dev is None:
            mapped = jax.shard_map(lambda x, tmat: local(x, tmat),
                                   mesh=mesh, in_specs=(vec, vec),
                                   out_specs=vec, check_vma=False)
            jitted = jax.jit(mapped)

            def call(x):
                # XLA:CPU segfaults (de)serializing shard_map executables
                # through the persistent cache — bypass it on CPU
                with runtime.cpu_no_persistent_cache():
                    return jitted(x, tmat_dev)

            return call
        mapped = jax.shard_map(lambda x, tmat, scl: local(x, tmat, scl),
                               mesh=mesh, in_specs=(vec, vec, vec),
                               out_specs=vec, check_vma=False)
        jitted = jax.jit(mapped)

        def call(x):
            with runtime.cpu_no_persistent_cache():
                return jitted(x, tmat_dev, scale_dev)

        return call

    @functools.cached_property
    def fft_fp(self):
        return self._wrap("fft_fp")

    @functools.cached_property
    def ifft_fp(self):
        return self._wrap("ifft_fp")

    @functools.cached_property
    def fft_ext3(self):
        return self._wrap("fft_ext3")

    @functools.cached_property
    def ifft_ext3(self):
        return self._wrap("ifft_ext3")
