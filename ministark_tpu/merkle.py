"""Merkle commitments: device-batched SHA-256 tree build + host multi-proofs.

Reference layout (src/merkle.rs): leaves are row-hash digests
(`MatrixMerkleTreeImpl`, :314-385); multi-proofs are `MerkleView`
{nodes, initial_leaves, sibling_leaves, height} in the StarkWare-style queue
order (:149-288).  The byte layout of proofs matches the reference so the
queue algorithms here mirror its sibling-pairing semantics exactly.

TPU redesign: row hashing and every tree level are one batched SHA-256 call
(ops/sha256.py); the reference's rayon subtree spawning (:438-483) has no
equivalent — levels ARE the parallel axis.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from . import hash as H
from .ntt import bit_reverse_indices
from .ops import sha256 as dsha


@dataclass
class MerkleView:
    """Multi-path proof (src/merkle.rs:68-81)."""
    nodes: list[bytes]
    initial_leaves: list[bytes]
    sibling_leaves: list[bytes]
    height: int

    def serialize(self, w):
        w.digest_vec(self.nodes)
        w.digest_vec(self.initial_leaves)
        w.digest_vec(self.sibling_leaves)
        w.u32(self.height)

    @staticmethod
    def deserialize(r) -> "MerkleView":
        return MerkleView(r.digest_vec(), r.digest_vec(), r.digest_vec(), r.u32())


# ---------------------------------------------------------------------------
# device-side build
# ---------------------------------------------------------------------------

def hash_rows_fp(cols_lo, cols_hi):
    """Row-hash an Fp matrix given stacked column limbs (ncols, n).

    Returns (n, 8) digest words on device. Row digest = SHA-256 of the
    concatenated 8-byte LE values in column order (= hash_elements of the row,
    src/hash.rs:92-100)."""
    row_lo = jnp.transpose(cols_lo)  # (n, ncols)
    row_hi = jnp.transpose(cols_hi)
    words = dsha.fp_rows_to_words(row_lo, row_hi)
    return dsha.sha256_words(words)


def hash_rows_ext3(c0, c1, c2):
    """Row-hash an Fq3 matrix; each arg is ((ncols,n) lo, (ncols,n) hi).

    Serialization order per element: c0 || c1 || c2, each 8 bytes LE."""
    parts = []
    for comp in (c0, c1, c2):
        lo = jnp.transpose(comp[0])
        hi = jnp.transpose(comp[1])
        parts.append(jnp.stack([dsha.byteswap32(lo), dsha.byteswap32(hi)], axis=-1))
    # parts[k] has shape (n, ncols, 2); interleave components per column:
    interleaved = jnp.concatenate(parts, axis=-1)  # (n, ncols, 6) == c0w0 c0w1 c1w0 c1w1 c2w0 c2w1
    n, ncols = interleaved.shape[0], interleaved.shape[1]
    words = interleaved.reshape(n, ncols * 6)
    return dsha.sha256_words(words)


def build_tree_levels(leaf_digest_words) -> list[np.ndarray]:
    """Build all tree levels from (n, 8) leaf digest words.

    Returns host numpy arrays [leaves(n,8), n/2, ..., 2, 1(root)]."""
    levels = [leaf_digest_words]
    cur = leaf_digest_words
    while cur.shape[0] > 1:
        cur = dsha.merge_words(cur[0::2], cur[1::2])
        levels.append(cur)
    return [np.asarray(l, dtype=np.uint32) for l in levels]


class CommittedMerkleTree:
    """A built tree: host copies of all levels, leaf digests included."""

    def __init__(self, levels: list[np.ndarray]):
        self.levels = levels
        self.n = levels[0].shape[0]
        assert self.n & (self.n - 1) == 0 and self.n >= 2

    @staticmethod
    def from_leaf_words(leaf_digest_words) -> "CommittedMerkleTree":
        return CommittedMerkleTree(build_tree_levels(leaf_digest_words))

    @property
    def height(self) -> int:
        return self.n.bit_length() - 1

    def root(self) -> bytes:
        return _digest_at(self.levels[-1], 0)

    def leaf(self, i: int) -> bytes:
        return _digest_at(self.levels[0], i)

    def node(self, level: int, i: int) -> bytes:
        """level 0 = leaves."""
        return _digest_at(self.levels[level], i)

    # -- multi-proof generation (queue algorithm, src/merkle.rs:149-207) -----

    def prove(self, indices: list[int]) -> MerkleView:
        n = self.n
        for i in indices:
            if i >= n:
                raise IndexError(f"leaf index {i} out of bounds for {n} leaves")
        idx = sorted(set(indices))

        initial_leaves: list[bytes] = []
        sibling_leaves: list[bytes] = []
        node_queue: list[int] = []  # indices in the conceptual nodes array (root=1)
        leaf_queue = list(idx)
        qi = 0
        while qi < len(leaf_queue):
            index = leaf_queue[qi]
            qi += 1
            initial_leaves.append(self.leaf(index))
            node_queue.append((n + index) >> 1)
            if qi < len(leaf_queue) and leaf_queue[qi] == index ^ 1:
                initial_leaves.append(self.leaf(index ^ 1))
                qi += 1
                continue
            sibling_leaves.append(self.leaf(index ^ 1))

        nodes: list[bytes] = []
        qn = 0
        while qn < len(node_queue):
            index = node_queue[qn]
            qn += 1
            if index > 2:
                node_queue.append(index >> 1)
            if qn < len(node_queue) and node_queue[qn] == index ^ 1:
                qn += 1
                continue
            nodes.append(self._node_by_flat_index(index ^ 1))

        return MerkleView(nodes, initial_leaves, sibling_leaves, self.height)

    def _node_by_flat_index(self, flat: int) -> bytes:
        """flat index in the 1-rooted array of internal nodes: depth d has
        indices [2^d, 2^{d+1}); level-from-leaves = height - d.

        flat == 0 only occurs for the degenerate 2-leaf tree, where the
        reference emits its default (all-zero) digest for the unused slot."""
        if flat == 0:
            return H.ZERO_DIGEST
        depth = flat.bit_length() - 1
        level = self.height - depth  # levels[level] has 2^depth entries
        pos = flat - (1 << depth)
        return self.node(level, pos)


def _digest_at(level: np.ndarray, i: int) -> bytes:
    return b"".join(int(w).to_bytes(4, "big") for w in level[i])


# ---------------------------------------------------------------------------
# verification (host; mirrors src/merkle.rs:209-288, 363-385)
# ---------------------------------------------------------------------------

class InvalidProof(Exception):
    pass


def verify_view(root: bytes, proof: MerkleView, indices: list[int]) -> None:
    height = proof.height
    n = 1 << height
    for i in indices:
        if i >= n:
            raise InvalidProof(f"leaf index {i} out of bounds")
    idx = sorted(set(indices))
    if len(idx) != len(proof.initial_leaves):
        raise InvalidProof("wrong number of leaves")

    siblings = list(proof.sibling_leaves)
    si = 0
    leaf_queue = list(zip(idx, proof.initial_leaves))
    node_queue: list[tuple[int, bytes]] = []
    qi = 0
    while qi < len(leaf_queue):
        index, leaf = leaf_queue[qi]
        qi += 1
        node_index = (n + index) >> 1
        if qi < len(leaf_queue) and leaf_queue[qi][0] == index ^ 1:
            node_queue.append((node_index, H.merge(leaf, leaf_queue[qi][1])))
            qi += 1
            continue
        if si >= len(siblings):
            raise InvalidProof("missing sibling leaf")
        sib = siblings[si]
        si += 1
        h = H.merge(leaf, sib) if index % 2 == 0 else H.merge(sib, leaf)
        node_queue.append((node_index, h))
    if si != len(siblings):
        raise InvalidProof("extra sibling leaves")

    nodes = list(proof.nodes)
    ni = 0
    qn = 0
    while qn < len(node_queue):
        index, h = node_queue[qn]
        qn += 1
        if index == 1:
            if qn != len(node_queue):
                raise InvalidProof("malformed proof")
            if root != h:
                raise InvalidProof("root mismatch")
            return
        if qn < len(node_queue) and node_queue[qn][0] == index ^ 1:
            node_queue.append((index >> 1, H.merge(h, node_queue[qn][1])))
            qn += 1
            continue
        if ni >= len(nodes):
            raise InvalidProof("missing node")
        sib = nodes[ni]
        ni += 1
        nh = H.merge(h, sib) if index % 2 == 0 else H.merge(sib, h)
        node_queue.append((index >> 1, nh))
    raise InvalidProof("proof did not reach root")


def verify_rows(root: bytes, row_ids: list[int], rows: list, proof: MerkleView) -> None:
    """Verify matrix rows: dedupe/sort by id, hash each row with
    hash_elements, compare to initial leaves, then verify paths
    (src/merkle.rs:363-385)."""
    inst = sorted({rid: row for rid, row in zip(row_ids, rows)}.items())
    indices = [rid for rid, _ in inst]
    leaves = [H.hash_elements(row) for _, row in inst]
    if leaves != proof.initial_leaves:
        raise InvalidProof("row hash mismatch")
    verify_view(root, proof, indices)


# ---------------------------------------------------------------------------
# matrix commitment helper (bit-reversed row order)
# ---------------------------------------------------------------------------

def commit_matrix_fp(cols_lo, cols_hi, bit_reversed_input: bool = False) -> CommittedMerkleTree:
    """Commit to an Fp matrix whose columns are given in NATURAL domain order
    (ncols, n); leaves follow the protocol's bit-reversed row order by
    permuting the row digests."""
    digests = hash_rows_fp(cols_lo, cols_hi)
    if not bit_reversed_input:
        perm = jnp.asarray(bit_reverse_indices(digests.shape[0]))
        digests = digests[perm]
    return CommittedMerkleTree.from_leaf_words(digests)


def commit_matrix_ext3(c0, c1, c2, bit_reversed_input: bool = False) -> CommittedMerkleTree:
    digests = hash_rows_ext3(c0, c1, c2)
    if not bit_reversed_input:
        perm = jnp.asarray(bit_reverse_indices(digests.shape[0]))
        digests = digests[perm]
    return CommittedMerkleTree.from_leaf_words(digests)
