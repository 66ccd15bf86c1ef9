"""FRI commit/fold/query (reference: src/fri.rs).

Protocol facts replicated exactly (they affect proof bytes):

* folding uses PLAIN (offset-1) domains regardless of the LDE coset — prover
  and verifier agree on this change of variable (src/fri.rs:526-567, 400);
* after each iNTT the coefficients are scaled by the folding factor N; the
  verifier's per-coset iNTT does the same (:541-543, :405-407);
* evaluations are committed in bit-reversed order, chunked into rows of N
  (so one Merkle path decommits a whole coset, :199-231);
* query positions live in bit-reversed space and fold as p -> p // N with
  dedup (:615-630);
* the remainder is the iNTT of the last layer; coefficients above
  size/blowup must be zero and are not sent (:233-249).

TPU design: folding is reshape+mul+tree-sum on device; the per-layer
bit-reversed view is a single gather; the layer Merkle build is the batched
SHA-256 tree from merkle.py.  The verifier side is exact host scalar math.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import merkle
from .fields import device as fd
from .fields.scalar import Fp, Fq3, P, get_root_of_unity
from .merkle import MerkleView
from .ntt import (Domain, bit_reverse_ext3, bit_reverse_fp, bit_reverse_index,
                  permute_bitrev)
from .composer import fq3_to_device_scalar, scalar_to_ext3


@dataclass(frozen=True)
class FriOptions:
    folding_factor: int
    max_remainder_coeffs: int
    blowup_factor: int

    def num_layers(self, domain_size: int) -> int:
        n, layers = domain_size, 0
        while n > self.max_remainder_coeffs * self.blowup_factor:
            n //= self.folding_factor
            layers += 1
        return layers

    def remainder_size(self, domain_size: int) -> int:
        n = domain_size
        while n > self.max_remainder_coeffs * self.blowup_factor:
            n //= self.folding_factor
        return n


@dataclass
class LayerProof:
    flattened_rows: list  # Fq values (row-major, N per row)
    merkle_proof: MerkleView
    commitment: bytes

    def serialize(self, w, fq):
        w.field_vec(self.flattened_rows)
        self.merkle_proof.serialize(w)
        w.digest(self.commitment)

    @staticmethod
    def deserialize(r, fq) -> "LayerProof":
        rows = r.field_vec(fq)
        proof = MerkleView.deserialize(r)
        return LayerProof(rows, proof, r.digest())


@dataclass
class FriProof:
    layers: list  # [LayerProof]
    remainder_coeffs: list  # [Fq]

    def serialize(self, w, fq):
        w.vec(self.layers, lambda w2, l: l.serialize(w2, fq))
        w.field_vec(self.remainder_coeffs)

    @staticmethod
    def deserialize(r, fq) -> "FriProof":
        layers = r.vec(lambda r2: LayerProof.deserialize(r2, fq))
        return FriProof(layers, r.field_vec(fq))


class VerificationError(Exception):
    pass


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

class _Layer:
    """A committed layer: Merkle tree + DEVICE row values; queried rows are
    fetched with one bulk gather at decommit time."""

    def __init__(self, tree, c0, c1, c2, fq_is_ext):
        self.tree = tree
        self.c = (c0, c1, c2)  # Ext3-style: each ((nrows,N) lo, hi); c1/c2 None if base
        self.fq_is_ext = fq_is_ext

    def rows_bulk(self, positions: list[int]) -> list[list]:
        """One jitted gather + ONE host transfer for all queried rows."""
        idx = jnp.asarray(np.asarray(positions, np.int32))
        arrays = [p for comp in (self.c if self.fq_is_ext else self.c[:1])
                  for p in comp]
        key = (len(arrays), tuple(arrays[0].shape), len(positions))
        if key not in _ROWS_PROGRAMS:
            _ROWS_PROGRAMS[key] = jax.jit(
                lambda arrs, ix: jnp.stack([a[ix] for a in arrs]))
        block = np.asarray(_ROWS_PROGRAMS[key](arrays, idx), dtype=np.uint64)
        comps = [block[2 * k] | (block[2 * k + 1] << np.uint64(32))
                 for k in range(len(arrays) // 2)]
        nrows, N = comps[0].shape
        if self.fq_is_ext:
            return [[Fq3(int(comps[0][r, j]), int(comps[1][r, j]), int(comps[2][r, j]))
                     for j in range(N)] for r in range(nrows)]
        return [[Fp(int(comps[0][r, j])) for j in range(N)] for r in range(nrows)]


class FriProver:
    """Builds FRI layers from the DEEP composition LDE.

    `evals` enter in NATURAL domain order as Ext3 device arrays; in base-field
    mode (fq == fp, e.g. fib) only component 0 is carried through the layers —
    a 3x saving on NTTs, folds and hashing.  Scalars leave the device only at
    commit boundaries.
    """

    def __init__(self, options: FriOptions, fq_is_ext: bool, hashfn=None,
                 executor=None):
        self.options = options
        self.fq_is_ext = fq_is_ext
        self.hashfn = hashfn if hashfn is not None else merkle.H
        self.executor = executor  # parallel/executor.py ShardedExecutor
        self.layers: list[_Layer] = []
        self.remainder_coeffs: list = []

    def build_layers(self, channel, evals: fd.Ext3):
        from . import hash_rpo

        assert not self.layers
        n = evals[0][0].shape[-1]
        if not self.fq_is_ext:
            evals = evals[0]  # Fp2; c1/c2 are structurally zero
        N = self.options.folding_factor
        # The fused pipeline's on-device Fiat-Shamir coin speaks SHA-256 and
        # RPO-256 (ops/coin.py): SHA coin fuses with SHA or RPO trees; the
        # fully-algebraic coin (coin_hash = hash_rpo) fuses when the trees
        # are RPO too — its reseed absorbs the root's 4 digest ELEMENTS, so
        # a SHA root (arbitrary bytes, possibly >= p) stays per-layer.
        coin_hash = getattr(channel.public_coin, "hashfn", None)
        coin_is_sha = coin_hash is merkle.H
        coin_is_rpo = coin_hash is hash_rpo
        if (merkle._lanes_mode() is not None and self.executor is None
                and self.options.num_layers(n) >= 1
                and ((coin_is_sha and self.hashfn in (merkle.H, hash_rpo))
                     or (coin_is_rpo and self.hashfn is hash_rpo))):
            return self._build_layers_fused(channel, evals, n, N)
        for _ in range(self.options.num_layers(n)):
            evals = self._build_layer(channel, evals, n, N)
            n //= N
        self._set_remainder(channel, evals, n)

    def _build_layers_fused(self, channel, evals, n: int, N: int):
        """The WHOLE FRI commit phase in ONE device dispatch: every fold,
        every Merkle level of every layer, AND the Fiat-Shamir reseed/draw
        steps between them (ops/coin.py) run on device.  The per-layer root
        readbacks the protocol seems to force (alpha_i depends on root_i)
        cost a relay round-trip each; moving the coin on-device removes them
        all.  The host coin then replays the transcript from the L roots —
        one small readback — and cross-checks every device-drawn alpha."""
        from . import hash_rpo
        from .ops import coin as dcoin

        interpret = merkle._lanes_mode() == "interpret"
        rpo = self.hashfn is not merkle.H
        rpo_coin = getattr(channel.public_coin, "hashfn", None) is hash_rpo
        L = self.options.num_layers(n)
        prog = _fri_pipeline_program(n, N, L, self.fq_is_ext, interpret, rpo,
                                     rpo_coin)
        seed_words = (dcoin.rpo_seed_to_words if rpo_coin
                      else dcoin.seed_to_words)(channel.public_coin.seed)
        layers_out, remainder, packed = prog(
            evals, seed_words, _fri_pipeline_tables(n, N, L))
        for rows, levels in layers_out:
            self._append_layer(rows, levels)
        # ONE host transfer for the coin block AND the remainder coefficients
        # (each jax.device_get costs a relay round-trip)
        blk, remainder = jax.device_get((packed, remainder))
        blk = np.asarray(blk, np.uint32)  # (L, 8 + 2k): root words, alphas
        k = 3 if self.fq_is_ext else 1
        byteorder = "little" if rpo else "big"
        for i in range(L):
            root = b"".join(int(w).to_bytes(4, byteorder)
                            for w in blk[i, :8])
            self.layers[i].tree._root = root
            channel.commit_fri_layer(root)
            host_alpha = channel.draw_fri_alpha()
            dev = [int(blk[i, 8 + 2 * j]) | (int(blk[i, 9 + 2 * j]) << 32)
                   for j in range(k)]
            host = ([host_alpha.c0.v, host_alpha.c1.v, host_alpha.c2.v]
                    if self.fq_is_ext else [host_alpha.v])
            if dev != host:
                raise AssertionError(
                    f"device coin diverged from host replay at FRI layer {i}:"
                    f" {dev} != {host}")
        self._finish_remainder(channel, remainder, n // N ** L)

    def _append_layer(self, rows, levels):
        tree = merkle.CommittedMerkleTree(levels, hashfn=self.hashfn,
                                          device_lanes=True,
                                          bitrev_storage=True)
        if self.fq_is_ext:
            c0, c1, c2 = rows
        else:
            c0, c1, c2 = rows, None, None
        self.layers.append(_Layer(tree, c0, c1, c2, self.fq_is_ext))

    def _finish_remainder(self, channel, coeffs, n: int):
        if self.fq_is_ext:
            vals = _ext3_to_scalars(coeffs, True)
        else:
            vals = [Fp(int(v)) for v in fd.unpack_np(coeffs).ravel()]
        max_coeffs = n // self.options.blowup_factor
        remainder, zero_tail = vals[:max_coeffs], vals[max_coeffs:]
        assert all(v.is_zero() for v in zero_tail), "remainder degree too high"
        channel.commit_remainder(remainder)
        self.remainder_coeffs = remainder

    def _commit_layer(self, evals, n: int, N: int):
        """Commit to bit-reversed evals chunked into rows of N."""
        if (self.executor is not None and self.hashfn is merkle.H
                and self.executor.fri_commit_supported(n, N)):
            return self.executor.fri_commit_layer(evals, n, N, self.fq_is_ext)
        rpo = self.hashfn is not merkle.H
        if self.fq_is_ext:
            bitrev = bit_reverse_ext3(evals)
            comps = [
                (b[0].reshape(n // N, N), b[1].reshape(n // N, N))
                for b in bitrev
            ]
            rows = [(jnp.transpose(c[0]), jnp.transpose(c[1])) for c in comps]
            digests = (merkle.hash_rows_ext3_rpo(*rows) if rpo
                       else merkle.hash_rows_ext3(*rows))
            c0, c1, c2 = comps
        else:
            b = bit_reverse_fp(evals)
            c0 = (b[0].reshape(n // N, N), b[1].reshape(n // N, N))
            c1 = c2 = None
            digests = (merkle.hash_rows_fp_rpo if rpo else merkle.hash_rows_fp)(
                jnp.transpose(c0[0]), jnp.transpose(c0[1]))
        tree = merkle.CommittedMerkleTree.from_leaf_words(
            digests, hashfn=self.hashfn)
        return tree, c0, c1, c2

    def _build_layer(self, channel, evals, n: int, N: int):
        tree, c0, c1, c2 = self._commit_layer(evals, n, N)
        channel.commit_fri_layer(tree.root())
        self.layers.append(_Layer(tree, c0, c1, c2, self.fq_is_ext))

        alpha = channel.draw_fri_alpha()
        if (self.executor is not None
                and self.executor.fri_fold_supported(n, N)):
            return self.executor.fri_fold(evals, n, N, alpha, self.fq_is_ext)
        if self.fq_is_ext:
            return fold_evals(evals, n, N, alpha)
        return fold_evals_fp(evals, n, N, alpha)

    def _set_remainder(self, channel, evals, n: int):
        dom = Domain(n)  # plain domain
        if self.fq_is_ext:
            coeffs = dom.ifft_ext3(evals)
            vals = _ext3_to_scalars(coeffs, True)
        else:
            coeffs = dom.ifft_fp(evals)
            vals = [Fp(int(v)) for v in fd.unpack_np(coeffs).ravel()]
        max_coeffs = n // self.options.blowup_factor
        remainder, zero_tail = vals[:max_coeffs], vals[max_coeffs:]
        assert all(v.is_zero() for v in zero_tail), "remainder degree too high"
        channel.commit_remainder(remainder)
        self.remainder_coeffs = remainder

    def into_proof(self, positions: list[int]) -> FriProof:
        N = self.options.folding_factor
        if self.layers and all(l.tree.device_lanes for l in self.layers):
            return self._into_proof_bundled(positions, N)
        proof_layers = []
        pos = list(positions)
        for layer in self.layers:
            pos = fold_positions(pos, N)
            rows = layer.rows_bulk(pos)
            flattened = [v for row in rows for v in row]
            mproof = layer.tree.prove(pos)
            proof_layers.append(LayerProof(flattened, mproof, layer.tree.root()))
        return FriProof(proof_layers, self.remainder_coeffs)

    def _into_proof_bundled(self, positions: list[int], N: int) -> FriProof:
        """Every layer's queried rows AND Merkle nodes in ONE device
        round-trip (merkle.fetch_bundle)."""
        specs_all, finish = self.decommit_plan(positions)
        return finish(merkle.fetch_bundle(specs_all))

    def decommit_plan(self, positions: list[int]):
        """(specs, finish): gather specs for merkle.fetch_bundle plus a
        finisher turning the fetched blocks into the FriProof.  Lets the
        prover fuse this decommit with the trace-query fetch into a single
        device transfer (prover.build_queries)."""
        N = self.options.folding_factor
        pos = list(positions)
        metas, specs_all = [], []
        for layer in self.layers:
            pos = fold_positions(pos, N)
            row_arrays = [p for comp in
                          (layer.c if self.fq_is_ext else layer.c[:1])
                          for p in comp]
            specs_all.append((row_arrays, pos, 0))
            meta, specs = layer.tree.fetch_plan(pos)
            metas.append((meta, len(specs)))
            specs_all.extend(specs)

        def finish(blocks) -> FriProof:
            proof_layers = []
            bi = 0
            for layer, (meta, nspecs) in zip(self.layers, metas):
                b = blocks[bi].astype(np.uint64)
                bi += 1
                comps = [b[2 * k] | (b[2 * k + 1] << np.uint64(32))
                         for k in range(b.shape[0] // 2)]
                nrows, width = comps[0].shape
                if self.fq_is_ext:
                    flattened = [
                        Fq3(int(comps[0][r, j]), int(comps[1][r, j]),
                            int(comps[2][r, j]))
                        for r in range(nrows) for j in range(width)]
                else:
                    flattened = [Fp(int(comps[0][r, j]))
                                 for r in range(nrows) for j in range(width)]
                mview = layer.tree.view_from(meta, blocks[bi:bi + nspecs])
                bi += nspecs
                proof_layers.append(
                    LayerProof(flattened, mview, layer.tree.root()))
            return FriProof(proof_layers, self.remainder_coeffs)

        return specs_all, finish

    def decommit_bundleable(self) -> bool:
        return bool(self.layers) and all(l.tree.device_lanes
                                         for l in self.layers)


# ---------------------------------------------------------------------------
# fused layer programs (TPU path): fold + bitrev + hash + full Merkle build
# ---------------------------------------------------------------------------

_FRI_PROGRAMS: dict = {}
_ROWS_PROGRAMS: dict = {}


def _alpha_device(alpha, fq_is_ext: bool):
    if fq_is_ext:
        return fq3_to_device_scalar(scalar_to_ext3(alpha))
    return (jnp.asarray(alpha.v & 0xFFFFFFFF, fd.U32),
            jnp.asarray(alpha.v >> 32, fd.U32))


def _commit_rows_traced(evals, n: int, N: int, fq_is_ext: bool,
                        interpret: bool, rpo: bool = False):
    """Traced body: bit-reverse, chunk into rows of N, row-hash, all levels.
    `rpo` selects the RPO-256 device tree (einsum MDS, lane-major levels —
    the same layout, so the decommit machinery is shared)."""
    from .ops import sha256_pallas as spl

    if fq_is_ext:
        rows = tuple(
            (permute_bitrev(c[0]).reshape(n // N, N),
             permute_bitrev(c[1]).reshape(n // N, N))
            for c in evals)
        cols = [(jnp.transpose(c[0]), jnp.transpose(c[1])) for c in rows]
        if rpo:
            return rows, merkle._rpo_tree_levels_traced_br(
                permute_bitrev(merkle.hash_rows_ext3_rpo(*cols), axis=0))
        lanes = spl.hash_rows_ext3_lanes(*cols, interpret=interpret)
    else:
        rows = (permute_bitrev(evals[0]).reshape(n // N, N),
                permute_bitrev(evals[1]).reshape(n // N, N))
        if rpo:
            return rows, merkle._rpo_tree_levels_traced_br(
                permute_bitrev(merkle.hash_rows_fp_rpo(
                    jnp.transpose(rows[0]), jnp.transpose(rows[1])), axis=0))
        lanes = spl.hash_rows_fp_lanes(
            jnp.transpose(rows[0]), jnp.transpose(rows[1]),
            interpret=interpret)
    # FRI leaf digests are produced in leaf order (no rev∘rev cancellation:
    # the evals were already bit-reversed for the row chunks), so the
    # tree-bitrev storage needs one small digest permute
    return rows, merkle.tree_levels_lanes_br(
        permute_bitrev(lanes, axis=1), interpret)


def _fri_pipeline_tables(n: int, N: int, L: int):
    """Per-layer NTT tables, built OUTSIDE the trace (powers() cache
    discipline) and passed as jit args so reseeding never recompiles."""
    tbls = []
    for i in range(L):
        dom_n, dom_m = Domain(n // N ** i), Domain(n // N ** (i + 1))
        tbls.append((dom_n._inv_tbl(), dom_n._inv_tmat(), dom_n._ipost_tbl(),
                     dom_m._fwd_tbl(), dom_m._fwd_tmat()))
    return tbls


def _fri_pipeline_program(n: int, N: int, L: int, fq_is_ext: bool,
                          interpret: bool, rpo: bool = False,
                          rpo_coin: bool = False):
    """ONE jitted program for the whole FRI commit phase (L >= 1 layers):

      commit layer 0 -> reseed(root_0) -> draw alpha_0 -> fold ->
      commit layer 1 -> ... -> final fold (= remainder coefficients).

    The remainder-layer fold needs no forward NTT: the host path computes
    fft(folded) then ifft's it straight back (_set_remainder), so the folded
    chunk vector IS the remainder coefficient vector.  Returns the layers'
    (rows, levels) device arrays, the remainder coeffs, and one packed
    (L, 8 + 2k) u32 array of [root words | alpha limbs] per layer — the
    only bytes the host needs, in a single transfer."""
    key = ("pipeline", n, N, L, fq_is_ext, interpret, rpo, rpo_coin)
    if key not in _FRI_PROGRAMS:
        from .ops import coin as dcoin
        from .ops import sha256 as dsha

        doms = [(Domain(n // N ** i), Domain(n // N ** (i + 1)))
                for i in range(L)]
        placeholder = fd.ones((1,))
        # the fully-algebraic coin reseeds/draws by RPO sponge; its state
        # words use the RPO levels' [lo, hi]-interleaved element layout, so
        # the root feeds it verbatim
        reseed = dcoin.rpo_reseed if rpo_coin else dcoin.reseed
        draw_fps = dcoin.rpo_draw_fps if rpo_coin else dcoin.draw_fps

        def root_for_coin(levels):
            # the SHA coin absorbs the digest's raw 32 bytes; SHA levels
            # hold big-endian stream words, RPO levels little-endian ones
            root = levels[-1][:, 0]
            if rpo_coin:
                return root
            return dsha.byteswap32(root) if rpo else root

        def prog(evals, seed_words, tbls):
            rows, levels = _commit_rows_traced(evals, n, N, fq_is_ext,
                                               interpret, rpo)
            out_layers = [(rows, levels)]
            seed = reseed(seed_words, root_for_coin(levels))
            alpha_words = []
            m = n
            for i in range(1, L + 1):
                dom_n, dom_m = doms[i - 1]
                itbl, itmat, ipost, ftbl, ftmat = tbls[i - 1]
                draws = draw_fps(seed, 3 if fq_is_ext else 1)
                alpha_words.append(jnp.stack(
                    [w for d in draws for w in d]))
                if fq_is_ext:
                    alpha = (draws[0], draws[1], draws[2])
                    coeffs = dom_n._ifft_ext3_impl(evals, itbl, placeholder,
                                                   itmat, ipost)
                    folded = _fold_body_ext3(coeffs, alpha, N)
                else:
                    coeffs = dom_n._ifft_fp_impl(evals, itbl, placeholder,
                                                 itmat, ipost)
                    folded = _fold_body_fp(coeffs, draws[0], N)
                if i < L:
                    fft = (dom_m._fft_ext3_impl if fq_is_ext
                           else dom_m._fft_fp_impl)
                    evals = fft(folded, ftbl, placeholder, ftmat, placeholder)
                    rows, levels = _commit_rows_traced(
                        evals, m // N, N, fq_is_ext, interpret, rpo)
                    out_layers.append((rows, levels))
                    seed = reseed(seed, root_for_coin(levels))
                else:
                    remainder = folded
                m //= N
            roots = jnp.stack([lv[-1][:, 0] for _, lv in out_layers])
            packed = jnp.concatenate([roots, jnp.stack(alpha_words)], axis=1)
            return out_layers, remainder, packed

        _FRI_PROGRAMS[key] = jax.jit(prog)
    return _FRI_PROGRAMS[key]


def _fold_body_ext3(coeffs: fd.Ext3, alpha: fd.Ext3, N: int) -> fd.Ext3:
    """out[i] = N * sum_j coeffs[i*N+j] * alpha^j  (alpha is a traced scalar
    so a new transcript never recompiles)."""
    n = coeffs[0][0].shape[0]
    resh = tuple((c[0].reshape(n // N, N), c[1].reshape(n // N, N))
                 for c in coeffs)
    acc = _ext3_col(resh, 0)
    apow = alpha
    for j in range(1, N):
        acc = fd.ext3_add(acc, fd.ext3_mul(_ext3_col(resh, j), apow))
        if j != N - 1:
            apow = fd.ext3_mul(apow, alpha)
    return fd.ext3_mul_base(acc, fd.full((), N))


def _fold_body_fp(coeffs: fd.Fp2, alpha: fd.Fp2, N: int) -> fd.Fp2:
    n = coeffs[0].shape[0]
    lo = coeffs[0].reshape(n // N, N)
    hi = coeffs[1].reshape(n // N, N)
    acc = (lo[:, 0], hi[:, 0])
    apow = alpha
    for j in range(1, N):
        acc = fd.add(acc, fd.mul((lo[:, j], hi[:, j]), apow))
        if j != N - 1:
            apow = fd.mul(apow, alpha)
    return fd.mul_const(acc, N)


_fold_core_ext3 = jax.jit(_fold_body_ext3, static_argnames=("N",))
_fold_core_fp = jax.jit(_fold_body_fp, static_argnames=("N",))


def fold_evals(evals: fd.Ext3, n: int, N: int, alpha) -> fd.Ext3:
    """One degree-respecting projection: plain iNTT, *N scale, fold coeff
    chunks by alpha powers, plain NTT on the smaller domain."""
    coeffs = Domain(n).ifft_ext3(evals)
    a = fq3_to_device_scalar(scalar_to_ext3(alpha))
    folded = _fold_core_ext3(coeffs, a, N)
    return Domain(n // N).fft_ext3(folded)


def fold_evals_fp(evals: fd.Fp2, n: int, N: int, alpha: Fp) -> fd.Fp2:
    """Base-field fold (fq == fp): identical algebra on one component."""
    coeffs = Domain(n).ifft_fp(evals)
    a = (jnp.asarray(alpha.v & 0xFFFFFFFF, fd.U32),
         jnp.asarray(alpha.v >> 32, fd.U32))
    folded = _fold_core_fp(coeffs, a, N)
    return Domain(n // N).fft_fp(folded)


def fold_positions(positions: list[int], N: int) -> list[int]:
    out = []
    for p in positions:
        q = p // N
        if not out or out[-1] != q:
            out.append(q)
    return out


def get_query_values(rows: list, positions: list[int], folded_positions: list[int], N: int):
    lookup = {fp: i for i, fp in enumerate(folded_positions)}
    return [rows[lookup[p // N]][p % N] for p in positions]


# ---------------------------------------------------------------------------
# verifier (host scalar)
# ---------------------------------------------------------------------------

class FriVerifier:
    def __init__(self, public_coin, options: FriOptions, proof: FriProof,
                 max_poly_degree: int, hashfn=None):
        self.options = options
        self.proof = proof
        self.hashfn = hashfn if hashfn is not None else merkle.H
        domain_size = _next_pow2(max_poly_degree + 1) * options.blowup_factor
        self.domain_size = domain_size
        self.domain_generator = get_root_of_unity(domain_size).v

        self.layer_alphas = []
        self.layer_commitments = []
        codeword_len = domain_size
        N = options.folding_factor
        for i, layer in enumerate(proof.layers):
            public_coin.reseed_with_digest(layer.commitment)
            self.layer_alphas.append(public_coin.draw())
            self.layer_commitments.append(layer.commitment)
            if i != len(proof.layers) - 1 and codeword_len % N != 0:
                raise VerificationError(
                    f"codeword length {codeword_len} not divisible by {N}")
            codeword_len //= N
        public_coin.reseed_with_field_element_vector(proof.remainder_coeffs)

    def verify(self, positions: list[int], evaluations: list) -> None:
        if len(positions) != len(evaluations):
            raise VerificationError("positions/evaluations length mismatch")
        N = self.options.folding_factor
        domain_size = self.domain_size
        g = self.domain_generator
        positions = list(positions)
        evaluations = list(evaluations)

        for i in range(self.options.num_layers(domain_size)):
            folded = fold_positions(positions, N)
            alpha = self.layer_alphas[i]
            commitment = self.layer_commitments[i]
            layer = self.proof.layers[i]
            rows = [layer.flattened_rows[k * N:(k + 1) * N]
                    for k in range(len(layer.flattened_rows) // N)]
            if len(rows) != len(folded):
                raise VerificationError(f"row count mismatch in layer {i}")

            try:
                merkle.verify_rows(commitment, folded, rows,
                                   layer.merkle_proof, hashfn=self.hashfn)
            except merkle.InvalidProof as e:
                raise VerificationError(f"layer {i} commitment invalid") from e

            query_values = get_query_values(rows, positions, folded, N)
            if evaluations != query_values:
                raise VerificationError(
                    f"degree-respecting projection invalid in layer {i}")

            # next-layer evals: per coset, iNTT (on coset g^bitrev(pos) of the
            # plain folding domain), coefficients *N, Horner at alpha
            offsets = [pow(g, bit_reverse_index(domain_size // N, p), P)
                       for p in folded]
            from . import native
            triples = native.fri_fold_rows(
                layer.flattened_rows[:len(rows) * N], N, offsets,
                get_root_of_unity(N).v, alpha)
            if triples is not None:
                is_ext = isinstance(alpha, Fq3) or isinstance(
                    layer.flattened_rows[0], Fq3)
                evaluations = [Fq3(*t) if is_ext else Fp(t[0])
                               for t in triples]
            else:
                evaluations = []
                for row, offset in zip(rows, offsets):
                    chunk = [row[bit_reverse_index(N, j)] for j in range(N)]
                    coeffs = _small_coset_ifft(chunk, N, offset)
                    acc = _fq_zero(chunk[0])
                    for c in reversed(coeffs):
                        acc = acc * alpha + c * N
                    evaluations.append(acc)
            positions = folded
            g = pow(g, N, P)
            domain_size //= N

        self._verify_remainder(positions, evaluations, g, domain_size)

    def _verify_remainder(self, positions, evaluations, g, domain_size):
        coeffs = list(self.proof.remainder_coeffs)
        while coeffs and coeffs[-1].is_zero():
            coeffs.pop()
        expected_degree = domain_size // self.options.blowup_factor - 1
        if len(coeffs) - 1 > expected_degree:
            raise VerificationError(
                f"remainder is not a degree {expected_degree} polynomial")
        for p, e in zip(positions, evaluations):
            x = Fp(pow(g, bit_reverse_index(domain_size, p), P))
            acc = _fq_zero(e)
            for c in reversed(self.proof.remainder_coeffs):
                acc = acc * x + c
            if acc != e:
                raise VerificationError("remainder mismatch")


def _small_coset_ifft(values: list, N: int, offset: int):
    """Naive size-N inverse NTT over coset {offset * w^i} (N <= 16)."""
    w = get_root_of_unity(N).v
    n_inv = pow(N, P - 2, P)
    off_inv = pow(offset, P - 2, P)
    coeffs = []
    for k in range(N):
        acc = _fq_zero(values[0])
        for i, v in enumerate(values):
            wexp = pow(w, (N - (i * k) % N) % N, P)  # w^{-ik}
            acc = acc + v * Fp(wexp)
        coeffs.append(acc * Fp(n_inv) * Fp(pow(off_inv, k, P)))
    return coeffs


def _fq_zero(like):
    return type(like).zero()


def _next_pow2(v: int) -> int:
    return 1 << (v - 1).bit_length() if v > 1 else 1


# ---------------------------------------------------------------------------
# device<->scalar conversion helpers
# ---------------------------------------------------------------------------

def _ext3_to_scalars(a: fd.Ext3, fq_is_ext: bool) -> list:
    c0 = fd.unpack_np(a[0]).ravel()
    c1 = fd.unpack_np(a[1]).ravel()
    c2 = fd.unpack_np(a[2]).ravel()
    if fq_is_ext:
        return [Fq3(int(x), int(y), int(z)) for x, y, z in zip(c0, c1, c2)]
    assert not c1.any() and not c2.any()
    return [Fp(int(x)) for x in c0]


def _ext3_col(a, j: int):
    """Column j of reshaped Ext3 arrays ((nrows, N) limbs)."""
    return tuple((c[0][:, j], c[1][:, j]) for c in a)
