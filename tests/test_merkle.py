"""Merkle tree tests (pattern: src/merkle.rs:510-626 plus tamper tests the
reference lacks)."""

import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from ministark_tpu import hash as H
from ministark_tpu import merkle, serde
from ministark_tpu.fields import Fp, P
from ministark_tpu.ntt import bit_reverse_indices
from ministark_tpu.ops import sha256 as dsha


RNG = np.random.default_rng(99)


def build_tree(n):
    leaves = [hashlib.sha256(i.to_bytes(4, "big")).digest() for i in range(n)]
    words = jnp.asarray(dsha.digest_bytes_to_words_np(leaves))
    return leaves, merkle.CommittedMerkleTree.from_leaf_words(words)


def reference_root(leaves):
    level = list(leaves)
    while len(level) > 1:
        level = [H.merge(level[i], level[i + 1]) for i in range(0, len(level), 2)]
    return level[0]


class TestTree:
    def test_root(self):
        leaves, tree = build_tree(16)
        assert tree.root() == reference_root(leaves)

    @pytest.mark.parametrize("indices", [[3], [0, 1], [0, 15], [2, 3, 11], list(range(16))])
    def test_prove_verify(self, indices):
        _, tree = build_tree(16)
        proof = tree.prove(indices)
        merkle.verify_view(tree.root(), proof, indices)

    def test_large_tree_single(self):
        _, tree = build_tree(1 << 10)
        proof = tree.prove([378])
        merkle.verify_view(tree.root(), proof, [378])

    def test_wrong_root_rejected(self):
        _, tree = build_tree(16)
        proof = tree.prove([5])
        with pytest.raises(merkle.InvalidProof):
            merkle.verify_view(b"\x01" * 32, proof, [5])

    def test_tampered_leaf_rejected(self):
        _, tree = build_tree(16)
        proof = tree.prove([5, 9])
        proof.initial_leaves[0] = b"\x02" * 32
        with pytest.raises(merkle.InvalidProof):
            merkle.verify_view(tree.root(), proof, [5, 9])

    def test_tampered_node_rejected(self):
        _, tree = build_tree(16)
        proof = tree.prove([5])
        proof.nodes[1] = b"\x03" * 32
        with pytest.raises(merkle.InvalidProof):
            merkle.verify_view(tree.root(), proof, [5])

    def test_wrong_indices_rejected(self):
        _, tree = build_tree(16)
        proof = tree.prove([5])
        with pytest.raises(merkle.InvalidProof):
            merkle.verify_view(tree.root(), proof, [6])

    def test_proof_serialization_roundtrip(self):
        _, tree = build_tree(16)
        proof = tree.prove([1, 7, 8])
        w = serde.Writer()
        proof.serialize(w)
        r = serde.Reader(w.bytes())
        back = merkle.MerkleView.deserialize(r)
        assert back == proof
        assert r.pos == len(w.bytes())


class TestMatrixCommit:
    def test_commit_matrix_fp_bit_reversed_rows(self):
        ncols, n = 3, 32
        vals = RNG.integers(0, P, size=(ncols, n), dtype=np.uint64)
        lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((vals >> 64 - 32).astype(np.uint32))
        tree = merkle.commit_matrix_fp(lo, hi)
        perm = bit_reverse_indices(n)
        # leaf i == hash_elements(natural row perm[i])
        for i in [0, 1, 5, 31]:
            row = [Fp(int(vals[c, perm[i]])) for c in range(ncols)]
            assert tree.leaf(i) == H.hash_elements(row)
        # verify_rows round trip with bit-reversed query positions
        positions = [0, 7, 20]
        proof = tree.prove(positions)
        rows = [[Fp(int(vals[c, perm[p]])) for c in range(ncols)] for p in positions]
        merkle.verify_rows(tree.root(), positions, rows, proof)

    def test_verify_rows_bad_row_rejected(self):
        ncols, n = 2, 16
        vals = RNG.integers(0, P, size=(ncols, n), dtype=np.uint64)
        lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((vals >> 32).astype(np.uint32))
        tree = merkle.commit_matrix_fp(lo, hi)
        proof = tree.prove([3])
        with pytest.raises(merkle.InvalidProof):
            merkle.verify_rows(tree.root(), [3], [[Fp(123), Fp(456)]], proof)
