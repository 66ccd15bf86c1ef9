"""Hand-scheduled multi-chip executor: Pallas kernels on local shards.

No reference counterpart (the reference is single-device; SURVEY.md
§2.5-2.6 derives the collective points).  ``prove_sharded`` used to rely on
GSPMD auto-partitioning with every fused/Pallas path disabled — correct,
but each chip then ran the slow one-HBM-pass-per-u32-op XLA paths
(VERDICT r3 weak #2).  This executor instead runs the HOT phases as
explicit ``shard_map`` programs whose per-chip bodies are the SAME
single-chip fused paths (six-step Pallas NTT, SHA-256 lanes row hash +
tree build), with communication placed exactly at the protocol's two
boundaries (BASELINE.md row 5):

* **LDE + commit (phases 1/2)**: trace columns shard over the mesh; each
  chip iNTT+NTTs its own FULL columns (zero comms), bit-reverses locally,
  then ONE all_to_all re-shards columns->rows; each chip lane-hashes its
  row block and builds its Merkle subtree; the log(d) tip is built from an
  all-gather of the d subtree roots.  The returned tree's levels are the
  local-subtree levels (globally concatenated, row-sharded) plus the
  replicated tip — a standard ``CommittedMerkleTree`` whose bulk-decommit
  machinery works unchanged.
* **FRI fold + layer commit**: the DEEP vector row-shards; folds run the
  distributed six-step (parallel/ntt.py — three all_to_alls of n/d each);
  the layer commit bit-reverses ACROSS the shard with one all_to_all
  (bitrev_n(c*m+j) = bitrev_m(j)*d + bitrev_d(c)), then hashes and builds
  subtree + tip locally.

Per-chip bodies trace under ``runtime.spmd_off()`` so the Pallas gates
(`ntt._use_pallas`, `merkle._lanes_mode`) select the fused kernels off-CPU
— inside shard_map each chip is ordinary single-device code, where Pallas
is legal.  On CPU test meshes the same gates pick the XLA stage paths (or
interpret-mode kernels via MINISTARK_TPU_LANES), so proof bytes are
identical on every backend (tests/test_sharded_prove*.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from .. import merkle, runtime
from ..fields import device as fd
from ..matrix import Matrix, MatrixExt3
from ..ntt import Domain, bit_reverse_indices, bit_reverse_fp, bit_reverse_ext3
from ..ops import sha256 as dsha
from .ntt import ShardedDomain


def _chip_mode():
    """Lanes-kernel mode INSIDE a shard_map body (trace time): Pallas on
    real hardware, interpret-mode on CPU when the test env asks for it,
    else the XLA ops path."""
    if jax.default_backend() != "cpu":
        return "run"
    if os.environ.get("MINISTARK_TPU_LANES") == "interpret":
        return "interpret"
    return None


def _levels_from_digests(digests):
    """(m, 8) row-major digest words -> lane-major (8, ...) tree levels."""
    mode = _chip_mode()
    if mode is not None:
        return merkle.tree_levels_lanes(jnp.transpose(digests),
                                        mode == "interpret")
    levels = [digests]
    cur = digests
    while cur.shape[0] > 1:
        cur = dsha.merge_words(cur[0::2], cur[1::2])
        levels.append(cur)
    return [jnp.transpose(l) for l in levels]


def _tip_levels(subroot, axis: str, d: int):
    """All-gather the d per-chip subtree roots and build the replicated tip.

    Returns lane-major (8, d/2) .. (8, 1) levels (the (8, d) level itself is
    the sharded concatenation of the locals).  Tiny — plain XLA merges."""
    roots = jax.lax.all_gather(subroot, axis)  # (d, 8)
    tips = []
    cur = roots
    while cur.shape[0] > 1:
        cur = dsha.merge_words(cur[0::2], cur[1::2])
        tips.append(jnp.transpose(cur))
    return tuple(tips)


class ShardedExecutor:
    """Hand-scheduled shard_map programs for the hot prover phases.

    One instance per (mesh, axis); programs cache per shape/config key."""

    def __init__(self, mesh: Mesh, axis: str = "col"):
        self.mesh = mesh
        self.axis = axis
        self.d = int(mesh.devices.size)
        self._programs: dict = {}

    # -- support predicates --------------------------------------------------

    def commit_supported(self, lde_n: int) -> bool:
        return lde_n % self.d == 0 and lde_n // self.d >= 1

    def fri_commit_supported(self, n: int, N: int) -> bool:
        d = self.d
        return n % (d * d) == 0 and (n // d) % N == 0

    def fri_fold_supported(self, n: int, N: int) -> bool:
        d = self.d
        return (n % (d * d) == 0 and (n // N) % (d * d) == 0
                and (n // d) % N == 0)

    # -- internals -----------------------------------------------------------

    def _col_spec(self):
        return PSpec(self.axis, None)

    def _put_cols(self, arr):
        return jax.device_put(arr, NamedSharding(self.mesh, self._col_spec()))

    def _pad_cols(self, arr, ncp: int):
        ncols = arr.shape[0]
        if ncols == ncp:
            return self._put_cols(arr)
        pad = jnp.zeros((ncp - ncols,) + arr.shape[1:], arr.dtype)
        return self._put_cols(jnp.concatenate([arr, pad], axis=0))

    def _to_rows(self, x, ncp: int, n: int):
        """Column shard -> row shard inside shard_map: (cpd, n) local full
        columns -> (ncp, m) full rows of my row block (global column
        order preserved: leading dim ordered by source chip)."""
        d, m = self.d, n // self.d
        xs = x.reshape(x.shape[0], d, m).transpose(1, 0, 2)
        xs = jax.lax.all_to_all(xs, self.axis, 0, 0, tiled=False)
        return xs.reshape(ncp, m)

    def _bitrev_shard(self, t, n: int):
        """Bit-reverse a (n,)-vector held as contiguous (n/d,) shards:
        bitrev_n(c*m + j) = bitrev_m(j)*d + bitrev_d(c) — one local
        permutation, one all_to_all of m/d elements, one tiny row gather."""
        d, m = self.d, n // self.d
        t = jnp.take(t, jnp.asarray(bit_reverse_indices(m)), axis=0)
        t = t.reshape(d, m // d)
        t = jax.lax.all_to_all(t, self.axis, 0, 0, tiled=False)
        t = jnp.take(t, jnp.asarray(bit_reverse_indices(d)), axis=0)
        return jnp.transpose(t).reshape(m)

    # -- phase 1/2: LDE + commit ---------------------------------------------

    def _lde_commit_program(self, kind: str, ncols: int, ncp: int,
                            trace_dom: Domain, lde_dom: Domain):
        key = ("ldec", kind, ncols, ncp, trace_dom.size, lde_dom.size,
               lde_dom.offset)
        if key in self._programs:
            return self._programs[key]
        mesh, ax, d = self.mesh, self.axis, self.d
        n = lde_dom.size
        ext = kind == "ext3"

        def per_chip(x, tabs):
            (itbl, iunscale, itmat, ipost, ftbl, fscale, ftmat, fbrv) = tabs
            if ext:
                polys = trace_dom._ifft_ext3_impl(x, itbl, iunscale, itmat,
                                                  ipost)
                lde = lde_dom._fft_ext3_impl(polys, ftbl, fscale, ftmat, fbrv)
                lde_br = bit_reverse_ext3(lde, axis=-1)
                rows = tuple(
                    (self._to_rows(c[0], ncp, n)[:ncols],
                     self._to_rows(c[1], ncp, n)[:ncols]) for c in lde_br)
                digests = merkle.hash_rows_ext3(*rows)
            else:
                polys = trace_dom._ifft_fp_impl(x, itbl, iunscale, itmat,
                                                ipost)
                lde = lde_dom._fft_fp_impl(polys, ftbl, fscale, ftmat, fbrv)
                lde_br = bit_reverse_fp(lde, axis=-1)
                rows_lo = self._to_rows(lde_br[0], ncp, n)[:ncols]
                rows_hi = self._to_rows(lde_br[1], ncp, n)[:ncols]
                digests = merkle.hash_rows_fp(rows_lo, rows_hi)
            levels = tuple(_levels_from_digests(digests))
            tips = _tip_levels(levels[-1][:, 0], ax, d)
            return lde, levels, tips

        cols = self._col_spec()
        rep = PSpec()
        xspec = jax.tree.map(lambda _: cols, ((0, 0), (0, 0), (0, 0))
                             if ext else (0, 0))
        tspec = jax.tree.map(lambda _: rep,
                             ((0, 0), (0, 0), (0, 0), (0, 0),
                              (0, 0), (0, 0), (0, 0), (0, 0)))
        nlocal = (n // d).bit_length()  # log2(m) + 1 local levels
        out_specs = (xspec,
                     tuple([PSpec(None, ax)] * nlocal),
                     tuple([rep] * max(d.bit_length() - 1, 0)))
        fn = jax.jit(jax.shard_map(
            per_chip, mesh=mesh, in_specs=(xspec, tspec),
            out_specs=out_specs, check_vma=False))
        self._programs[key] = fn
        return fn

    def _lde_commit(self, kind: str, planes, ncols: int, trace_dom: Domain,
                    lde_dom: Domain):
        d = self.d
        ncp = -(-ncols // d) * d  # pad column count to a multiple of d
        with runtime.spmd_off():
            prog = self._lde_commit_program(kind, ncols, ncp, trace_dom,
                                            lde_dom)
            x = jax.tree.map(lambda a: self._pad_cols(a, ncp), planes)
            tabs = (trace_dom._inv_tbl(), trace_dom._unscale_tbl(),
                    trace_dom._inv_tmat(), trace_dom._ipost_tbl(),
                    lde_dom._fwd_tbl(), lde_dom._scale_tbl(),
                    lde_dom._fwd_tmat(), lde_dom._scale_brv_tbl())
            with runtime.cpu_no_persistent_cache():
                lde, levels, tips = prog(x, tabs)
        tree = merkle.CommittedMerkleTree(list(levels) + list(tips),
                                          device_lanes=True)
        return lde, tree

    def lde_commit_fp(self, matrix: Matrix, trace_dom: Domain,
                      lde_dom: Domain):
        """iNTT + coset LDE + Merkle commit of an Fp trace matrix, sharded.
        Returns (lde Matrix in natural order, CommittedMerkleTree)."""
        ncols = matrix.num_cols
        lde, tree = self._lde_commit("fp", (matrix.lo, matrix.hi), ncols,
                                     trace_dom, lde_dom)
        return Matrix(lde[0][:ncols], lde[1][:ncols]), tree

    def lde_commit_ext3(self, matrix: MatrixExt3, trace_dom: Domain,
                        lde_dom: Domain):
        ncols = matrix.num_cols
        lde, tree = self._lde_commit("ext3", matrix.as_ext3(), ncols,
                                     trace_dom, lde_dom)
        return MatrixExt3(*[(c[0][:ncols], c[1][:ncols]) for c in lde]), tree

    # -- FRI: layer commit ----------------------------------------------------

    def _fri_commit_program(self, n: int, N: int, fq_is_ext: bool):
        key = ("fric", n, N, fq_is_ext)
        if key in self._programs:
            return self._programs[key]
        mesh, ax, d = self.mesh, self.axis, self.d
        m = n // d

        def per_chip(x):
            def rows_of(plane):
                return self._bitrev_shard(plane, n).reshape(m // N, N)

            if fq_is_ext:
                rows = tuple((rows_of(c[0]), rows_of(c[1])) for c in x)
                digests = merkle.hash_rows_ext3(
                    *[(jnp.transpose(c[0]), jnp.transpose(c[1]))
                      for c in rows])
            else:
                rows = (rows_of(x[0]), rows_of(x[1]))
                digests = merkle.hash_rows_fp(jnp.transpose(rows[0]),
                                              jnp.transpose(rows[1]))
            levels = tuple(_levels_from_digests(digests))
            tips = _tip_levels(levels[-1][:, 0], ax, d)
            return rows, levels, tips

        vec = PSpec(ax)
        xspec = jax.tree.map(lambda _: vec, ((0, 0),) * 3 if fq_is_ext
                             else (0, 0))
        rowspec = jax.tree.map(lambda _: PSpec(ax, None),
                               ((0, 0),) * 3 if fq_is_ext else (0, 0))
        nlocal = (m // N).bit_length()
        out_specs = (rowspec,
                     tuple([PSpec(None, ax)] * nlocal),
                     tuple([PSpec()] * max(d.bit_length() - 1, 0)))
        fn = jax.jit(jax.shard_map(per_chip, mesh=mesh, in_specs=(xspec,),
                                   out_specs=out_specs, check_vma=False))
        self._programs[key] = fn
        return fn

    def fri_commit_layer(self, evals, n: int, N: int, fq_is_ext: bool):
        """Commit to bit-reversed evals chunked into rows of N (the layer
        tree), sharded.  Returns (tree, c0, c1, c2) as fri._commit_layer."""
        with runtime.spmd_off():
            prog = self._fri_commit_program(n, N, fq_is_ext)
            with runtime.cpu_no_persistent_cache():
                rows, levels, tips = prog(evals)
        tree = merkle.CommittedMerkleTree(list(levels) + list(tips),
                                          device_lanes=True)
        if fq_is_ext:
            return tree, rows[0], rows[1], rows[2]
        return tree, rows, None, None

    # -- FRI: fold ------------------------------------------------------------

    def _fri_fold_program(self, n: int, N: int, fq_is_ext: bool):
        key = ("frif", n, N, fq_is_ext)
        if key in self._programs:
            return self._programs[key]
        mesh, ax, d = self.mesh, self.axis, self.d
        sdom = ShardedDomain(mesh, n, 1, ax)
        sdom_small = ShardedDomain(mesh, n // N, 1, ax)
        sh = NamedSharding(mesh, PSpec(ax))
        itm = tuple(jax.device_put(t, sh) for t in sdom.inv_tables_np()[0])
        ftm = tuple(jax.device_put(t, sh)
                    for t in sdom_small.fwd_tables_np()[0])
        m = n // d

        def per_chip(x, alpha, itm_l, ftm_l):
            if fq_is_ext:
                coeffs = sdom.ifft_ext3_local(x, itm_l)
                resh = tuple((c[0].reshape(m // N, N), c[1].reshape(m // N, N))
                             for c in coeffs)
                acc = tuple((c[0][:, 0], c[1][:, 0]) for c in resh)
                apow = alpha
                for j in range(1, N):
                    col = tuple((c[0][:, j], c[1][:, j]) for c in resh)
                    acc = fd.ext3_add(acc, fd.ext3_mul(col, apow))
                    if j != N - 1:
                        apow = fd.ext3_mul(apow, alpha)
                folded = fd.ext3_mul_base(acc, fd.full((), N))
                return sdom_small.fft_ext3_local(folded, ftm_l)
            coeffs = sdom.ifft_fp_local(x, itm_l)
            lo = coeffs[0].reshape(m // N, N)
            hi = coeffs[1].reshape(m // N, N)
            acc = (lo[:, 0], hi[:, 0])
            apow = alpha
            for j in range(1, N):
                acc = fd.add(acc, fd.mul((lo[:, j], hi[:, j]), apow))
                if j != N - 1:
                    apow = fd.mul(apow, alpha)
            folded = fd.mul_const(acc, N)
            return sdom_small.fft_fp_local(folded, ftm_l)

        vec = PSpec(ax)
        rep = PSpec()
        xspec = jax.tree.map(lambda _: vec, ((0, 0),) * 3 if fq_is_ext
                             else (0, 0))
        aspec = jax.tree.map(lambda _: rep, ((0, 0),) * 3 if fq_is_ext
                             else (0, 0))
        fn = jax.jit(jax.shard_map(
            per_chip, mesh=mesh,
            in_specs=(xspec, aspec, (vec, vec), (vec, vec)),
            out_specs=xspec, check_vma=False))
        self._programs[key] = (fn, itm, ftm)
        return self._programs[key]

    def fri_fold(self, evals, n: int, N: int, alpha, fq_is_ext: bool):
        """Degree-respecting projection, distributed (fri.fold_evals
        semantics: plain-domain iNTT, *N, alpha-fold, plain NTT on n/N)."""
        from ..fri import _alpha_device

        with runtime.spmd_off():
            fn, itm, ftm = self._fri_fold_program(n, N, fq_is_ext)
            a = _alpha_device(alpha, fq_is_ext)
            with runtime.cpu_no_persistent_cache():
                return fn(evals, a, itm, ftm)
