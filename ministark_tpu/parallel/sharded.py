"""Multi-chip sharding (no reference counterpart — the reference is
single-device; SURVEY.md §2.5-2.6 derives the required collective points).

Design (maps STARK structure onto a TPU mesh):

* **column sharding** (the `col` mesh axis — the tensor-parallel analogue):
  trace columns are independent through iNTT/NTT/LDE, so the (ncols, n)
  matrices shard on axis 0 with zero communication through the transforms;
* **Merkle commit boundary**: row hashing needs whole rows -> one
  `all_to_all` converts the column shard into a row shard (each chip hashes
  n/d full rows), then each chip builds its subtree and the log(d) tip is
  reduced from the per-chip subtree roots;
* **FRI fold boundary**: the DEEP vector row-shards; each fold is local
  after an all-gather of the (already small) coefficient vector.

Collectives ride the ICI ring exactly at the two boundaries BASELINE.md
prescribes (Merkle commit, FRI fold).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..fields import device as fd
from ..ntt import Domain, bit_reverse_indices
from ..ops import sha256 as dsha


def make_mesh(n_devices: int | None = None, axis: str = "col",
              devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_columns(mesh: Mesh, matrix_pair, axis="col"):
    """Place (ncols, n) limb arrays with columns sharded across the mesh."""
    sharding = NamedSharding(mesh, PSpec(axis, None))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), matrix_pair)


def sharded_lde_and_commit(mesh: Mesh, trace_dom: Domain, lde_dom: Domain):
    """Returns a jitted fn: (lo, hi) (ncols, n) column-sharded ->
    (lde_lo, lde_hi, root_words).

    Inside shard_map each chip: iNTT+NTT its own columns (no comms), then one
    all_to_all re-shards to rows for hashing, local subtree build, and a
    gather of the d subtree roots for the tip.
    """
    naxis = mesh.devices.size
    n = lde_dom.size
    assert n % naxis == 0

    # numpy (not jnp): a device constant here would land on the ambient
    # default device, which may not belong to `mesh` (e.g. CPU-mesh dryrun
    # under a TPU-default environment)
    perm = bit_reverse_indices(n)

    def per_chip(lo, hi):
        # local columns: (ncols/d, trace_n)
        polys = trace_dom.ifft_fp((lo, hi))
        lde = lde_dom.fft_fp(polys)

        # commit order is bit-reversed; permute columns before resharding
        lde_br = (lde[0][:, perm], lde[1][:, perm])

        # column shard -> row shard: split rows axis, all_to_all
        def to_rows(x):
            # x: (local_cols, n) -> (d, local_cols, n/d) -> all_to_all over d
            xs = x.reshape(x.shape[0], naxis, n // naxis).transpose(1, 0, 2)
            xs = jax.lax.all_to_all(xs, "col", 0, 0, tiled=False)
            # now (d, local_cols, n/d) where leading dim = source chip
            return jnp.concatenate([xs[i] for i in range(naxis)], axis=0)

        rows_lo = to_rows(lde_br[0])  # (ncols, n/d) full columns, my row block
        rows_hi = to_rows(lde_br[1])
        digests = dsha.sha256_words(
            dsha.fp_rows_to_words(jnp.transpose(rows_lo), jnp.transpose(rows_hi)))

        # local subtree -> subtree root
        cur = digests
        while cur.shape[0] > 1:
            cur = dsha.merge_words(cur[0::2], cur[1::2])
        my_root = cur[0]  # (8,)

        # gather the d subtree roots and finish the tip on every chip
        roots = jax.lax.all_gather(my_root, "col")  # (d, 8)
        tip = roots
        while tip.shape[0] > 1:
            tip = dsha.merge_words(tip[0::2], tip[1::2])
        return lde[0], lde[1], tip[0]

    fn = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(PSpec("col", None), PSpec("col", None)),
        out_specs=(PSpec("col", None), PSpec("col", None), PSpec()),
        # the tip is computed identically on every chip from the all-gathered
        # subtree roots; the varying-axis checker cannot infer that
        check_vma=False,
    )
    jitted = jax.jit(fn)
    from .. import runtime

    def call(lo, hi):
        # XLA:CPU segfaults (de)serializing shard_map executables through
        # the persistent cache — bypass it on CPU
        with runtime.cpu_no_persistent_cache():
            return jitted(lo, hi)

    return call


def sharded_fri_fold(mesh: Mesh, n: int, folding_factor: int):
    """Row-sharded FRI fold step: evals (n,) -> folded evals (n/N,).

    Fully distributed: the iNTT and the post-fold NTT both run as sharded
    six-step transforms (parallel/ntt.py) — communication is all-to-alls of
    n/d elements, never a full-vector gather.  The coefficient fold itself
    (chunk-by-alpha-powers, src/fri.rs:526-567 semantics) is local because a
    contiguous coefficient shard contains whole N-chunks."""
    from .ntt import ShardedDomain

    N = folding_factor
    d = mesh.devices.size
    sdom = ShardedDomain(mesh, n)
    sdom_small = ShardedDomain(mesh, n // N)

    sh = NamedSharding(mesh, PSpec("col"))
    itmat = tuple(jax.device_put(t, sh) for t in sdom.inv_tables_np()[0])
    ftmat = tuple(jax.device_put(t, sh) for t in sdom_small.fwd_tables_np()[0])

    def per_chip(lo, hi, alo, ahi, itm, ftm):
        m = n // d  # local coefficient count; N | m for all supported configs
        coeffs = sdom.ifft_fp_local((lo, hi), itm)
        coeffs = fd.mul(coeffs, fd.full((m,), N))
        resh = (coeffs[0].reshape(m // N, N), coeffs[1].reshape(m // N, N))
        apow = fd.ones((1,))
        acc = (resh[0][:, 0], resh[1][:, 0])
        a = (alo, ahi)
        for j in range(1, N):
            apow = fd.mul(apow, a)
            term = fd.mul((resh[0][:, j], resh[1][:, j]),
                          (jnp.broadcast_to(apow[0], (m // N,)),
                           jnp.broadcast_to(apow[1], (m // N,))))
            acc = fd.add(acc, term)
        return sdom_small.fft_fp_local(acc, ftm)

    fn = jax.shard_map(
        per_chip,
        mesh=mesh,
        in_specs=(PSpec("col"), PSpec("col"), PSpec(), PSpec(),
                  PSpec("col"), PSpec("col")),
        out_specs=(PSpec("col"), PSpec("col")),
        check_vma=False,
    )
    jitted = jax.jit(fn)
    from .. import runtime

    def call(lo, hi, alo, ahi):
        with runtime.cpu_no_persistent_cache():
            return jitted(lo, hi, alo, ahi, itmat, ftmat)

    return call
