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

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import hash as H
from .ntt import permute_bitrev
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

def _lanes_mode():
    """'run' (TPU Pallas), 'interpret' (CPU test override via
    MINISTARK_TPU_LANES=interpret), or None (host/XLA path).

    SPMD mode (multi-chip prove) forces None: GSPMD cannot partition
    pallas_call over mesh-sharded operands."""
    from . import runtime

    if runtime.spmd():
        return None
    if jax.default_backend() != "cpu":
        return "run"
    if os.environ.get("MINISTARK_TPU_LANES") == "interpret":
        return "interpret"
    return None


def _lanes_backend() -> bool:
    """Use the Pallas lane-major SHA kernel off-CPU (XLA:TPU runs each u32 op
    as a separate HBM pass; the kernel keeps the compression in VMEM)."""
    return _lanes_mode() is not None


def hash_rows_fp(cols_lo, cols_hi):
    """Row-hash an Fp matrix given stacked column limbs (ncols, n).

    Returns (n, 8) digest words on device. Row digest = SHA-256 of the
    concatenated 8-byte LE values in column order (= hash_elements of the row,
    src/hash.rs:92-100)."""
    mode = _lanes_mode()
    if mode is not None:
        from .ops import sha256_pallas as spl

        return jnp.transpose(spl.hash_rows_fp_lanes(
            cols_lo, cols_hi, interpret=mode == "interpret"))
    row_lo = jnp.transpose(cols_lo)  # (n, ncols)
    row_hi = jnp.transpose(cols_hi)
    words = dsha.fp_rows_to_words(row_lo, row_hi)
    return dsha.sha256_words(words)


def hash_rows_ext3(c0, c1, c2):
    """Row-hash an Fq3 matrix; each arg is ((ncols,n) lo, (ncols,n) hi).

    Serialization order per element: c0 || c1 || c2, each 8 bytes LE."""
    mode = _lanes_mode()
    if mode is not None:
        from .ops import sha256_pallas as spl

        return jnp.transpose(spl.hash_rows_ext3_lanes(
            c0, c1, c2, interpret=mode == "interpret"))
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


# ---------------------------------------------------------------------------
# RPO-256 trees (second ElementHashFn, reference gpu/src/plan.rs:32-174)
# ---------------------------------------------------------------------------
# Digest representation: (n, 8) u32 words [lo0, hi0, lo1, hi1, ...] — the 4
# digest field elements as little-endian u64s (hash_rpo._digest_bytes layout).

def _rpo_lanes_mode():
    """'run' (TPU Pallas RPO kernel), 'interpret' (CPU test override via
    MINISTARK_TPU_RPO=interpret), or None (XLA path).  Same gate shape as
    _lanes_mode; the kernel needs the lane count to be a 128-multiple."""
    from . import runtime

    if runtime.spmd():
        return None
    if jax.default_backend() != "cpu":
        return "run"
    if os.environ.get("MINISTARK_TPU_RPO") == "interpret":
        return "interpret"
    return None


def _rpo_words(dg):
    """(n, 4) digest limb pairs -> (n, 8) interleaved u32 words."""
    return jnp.stack([dg[0], dg[1]], axis=2).reshape(dg[0].shape[0], 8)


def _rpo_pairs(words):
    """(n, 8) interleaved words -> (n, 4) limb pairs."""
    return (words[:, 0::2], words[:, 1::2])


def hash_rows_fp_rpo(cols_lo, cols_hi):
    """RPO row hash of an Fp matrix given stacked column limbs (ncols, n)."""
    cols = [(cols_lo[i], cols_hi[i]) for i in range(cols_lo.shape[0])]
    mode = _rpo_lanes_mode()
    if mode is not None and cols_lo.shape[1] % 128 == 0:
        from .ops import rpo256_pallas as rpl

        # (8, n) lanes -> (n, 8): inside a jitted tree build XLA cancels
        # this against _rpo_tree_levels_traced_br's leading transpose
        return jnp.transpose(
            rpl.hash_columns_lanes(cols, interpret=mode == "interpret"))
    from .ops import rpo256

    return _rpo_words(rpo256.hash_elements_batch(cols))


def hash_rows_ext3_rpo(c0, c1, c2):
    """RPO row hash of an Fq3 matrix: each element absorbs as its 3 base
    coefficients in order (the canonical flattening `hash_elements` uses)."""
    ncols = c0[0].shape[0]
    cols = []
    for i in range(ncols):
        for comp in (c0, c1, c2):
            cols.append((comp[0][i], comp[1][i]))
    mode = _rpo_lanes_mode()
    if mode is not None and c0[0].shape[1] % 128 == 0:
        from .ops import rpo256_pallas as rpl

        return jnp.transpose(
            rpl.hash_columns_lanes(cols, interpret=mode == "interpret"))
    from .ops import rpo256

    return _rpo_words(rpo256.hash_elements_batch(cols))


_RPO_TREE_PROGRAMS: dict = {}


def _rpo_tree_levels_traced(words) -> list:
    """All tree levels from (n, 8) RPO leaf words, returned DEVICE-RESIDENT
    in lane-major (8, m) form (the same layout the SHA lanes path uses, so
    CommittedMerkleTree's bulk-fetch decommit machinery applies unchanged).
    Jit-traceable; levels never round-trip to the host — a 2^23-leaf tree is
    ~0.5 GB of digests, which would drown the TPU tunnel.  NATURAL storage
    order (strided row slices per level); prefer the _br variant."""
    from .ops import rpo256

    levels = [jnp.transpose(words)]
    cur = words
    while cur.shape[0] > 1:
        left = _rpo_pairs(cur[0::2])
        right = _rpo_pairs(cur[1::2])
        cur = _rpo_words(rpo256.merge_digests(left, right))
        levels.append(jnp.transpose(cur))
    return levels


def _rpo_tree_levels_traced_br(words) -> list:
    """RPO tree levels in TREE-BITREV storage order (see
    tree_levels_lanes_br): siblings are contiguous halves, no strided
    slicing.  Input (n, 8) words in STORAGE order (node bitrev(p) at row
    p); wrap with bitrev_storage=True."""
    mode = _rpo_lanes_mode()
    if mode is not None and words.shape[0] % 256 == 0 and words.shape[0] >= 256:
        from .ops import rpo256_pallas as rpl

        # Pallas merges down to the 128-lane level, XLA merges for the tip
        lanes = jnp.transpose(words)
        levels = [lanes]
        cur = lanes
        while cur.shape[1] >= 256 and cur.shape[1] % 256 == 0:
            half = cur.shape[1] // 2
            cur = rpl.merge_lanes(cur[:, :half], cur[:, half:],
                                  interpret=mode == "interpret")
            levels.append(cur)
        levels.extend(_rpo_tree_levels_traced_br(jnp.transpose(cur))[1:])
        return levels
    from .ops import rpo256

    levels = [jnp.transpose(words)]
    cur = words
    while cur.shape[0] > 1:
        half = cur.shape[0] // 2
        left = _rpo_pairs(cur[:half])
        right = _rpo_pairs(cur[half:])
        cur = _rpo_words(rpo256.merge_digests(left, right))
        levels.append(jnp.transpose(cur))
    return levels


def build_tree_levels_rpo(leaf_words) -> list:
    """All tree levels from (n, 8) RPO leaf words in LEAF order — ONE
    jitted program, levels staying on device (lane-major, TREE-BITREV
    storage: wrap with bitrev_storage=True)."""
    n = int(leaf_words.shape[0])
    if n not in _RPO_TREE_PROGRAMS:
        def prog(words):
            return _rpo_tree_levels_traced_br(permute_bitrev(words, axis=0))

        _RPO_TREE_PROGRAMS[n] = jax.jit(prog)
    return _RPO_TREE_PROGRAMS[n](leaf_words)


def build_tree_levels_device(leaf_digest_words, interpret: bool = False) -> list:
    """Device-resident tree build via the lane-major Pallas kernel: the
    levels STAY on device ((8, m) lane-major, TREE-BITREV storage — wrap
    with bitrev_storage=True); only root + queried paths ever cross to the
    host (a 2^23-leaf tree is ~0.5 GB of digests — pulling it through the
    TPU tunnel would dwarf the hash work)."""
    lanes = permute_bitrev(jnp.transpose(leaf_digest_words), axis=1)
    return tree_levels_lanes_br(lanes, interpret)


_GATHER_PROGRAMS: dict = {}
_BUNDLE_PROGRAMS: dict = {}


def fetch_bundle(specs: list) -> list[np.ndarray]:
    """Fetch many gathers with ONE jitted program and ONE device transfer.

    specs: list of (arrays, idx, axis) — arrays share a shape within a spec;
    idx is a 1-D numpy int array; the gather runs along `axis`.  Returns, per
    spec, a numpy block of shape (len(arrays), *gathered shape).  On the
    remote-TPU relay every eager gather+readback costs a round-trip; a whole
    proof decommit (trace trees + every FRI layer) is ONE here."""
    key = tuple((len(arrs), tuple(arrs[0].shape), len(idx), axis)
                for (arrs, idx, axis) in specs)
    if key not in _BUNDLE_PROGRAMS:
        axes = [axis for (_a, _i, axis) in specs]

        def prog(arr_lists, idx_arrays):
            parts = []
            for arrs, ix, axis in zip(arr_lists, idx_arrays, axes):
                g = jnp.stack([jnp.take(a, ix, axis=axis) for a in arrs])
                parts.append(g.reshape(-1))
            return jnp.concatenate(parts)

        _BUNDLE_PROGRAMS[key] = jax.jit(prog)

    packed = np.asarray(_BUNDLE_PROGRAMS[key](
        [list(arrs) for (arrs, _i, _x) in specs],
        [jnp.asarray(np.asarray(idx, np.int32)) for (_a, idx, _x) in specs]),
        dtype=np.uint32)
    out = []
    off = 0
    for (arrs, idx, axis) in specs:
        shape = list(arrs[0].shape)
        shape[axis] = len(idx)
        size = len(arrs) * int(np.prod(shape))
        out.append(packed[off:off + size].reshape(len(arrs), *shape))
        off += size
    return out


class CommittedMerkleTree:
    """A built tree; levels either host numpy (n,8) row-major or device
    lane-major (8, n) fetched lazily in bulk at decommit time.

    `hashfn` is the module providing merge/hash_elements (hash = SHA-256 or
    hash_rpo = RPO-256) — the analogue of the reference's MerkleTreeConfig
    parametrization (src/merkle.rs:57-66)."""

    def __init__(self, levels: list, hashfn=H, device_lanes: bool = False,
                 bitrev_storage: bool = False):
        self.levels = levels
        self.hashfn = hashfn
        self.device_lanes = device_lanes
        # tree-bitrev storage (tree_levels_lanes_br): level arrays hold node
        # bitrev(p) at column p; fetches translate indices host-side
        self.bitrev_storage = bitrev_storage
        self.n = int(levels[0].shape[1] if device_lanes else levels[0].shape[0])
        assert self.n & (self.n - 1) == 0 and self.n >= 2
        self._root = None
        # digest word->byte order: SHA-256 words serialize big-endian, RPO
        # digests are 4 canonical-LE u64s stored as (lo, hi) u32 word pairs
        self._be = getattr(hashfn, "DIGEST_WORDS_BE", True)

    def _storage_ix(self, level: int, indices):
        """Logical node indices -> storage columns at `level`."""
        if not self.bitrev_storage:
            return list(indices)
        from .ntt import bit_reverse_index

        m = self.n >> level
        return [bit_reverse_index(m, i) for i in indices]

    @staticmethod
    def from_leaf_words(leaf_digest_words, hashfn=H) -> "CommittedMerkleTree":
        if hashfn is not H:
            return CommittedMerkleTree(
                build_tree_levels_rpo(leaf_digest_words), hashfn=hashfn,
                device_lanes=True, bitrev_storage=True)
        mode = _lanes_mode()
        if mode is not None:
            return CommittedMerkleTree(
                build_tree_levels_device(leaf_digest_words,
                                         interpret=mode == "interpret"),
                device_lanes=True, bitrev_storage=True)
        return CommittedMerkleTree(build_tree_levels(leaf_digest_words))

    @property
    def height(self) -> int:
        return self.n.bit_length() - 1

    def _fetch(self, level: int, indices: list[int]) -> dict[int, bytes]:
        """Bulk digest fetch from one level: {index: 32-byte digest}."""
        got = self._fetch_many({level: indices})
        return {i: d for (_lvl, i), d in got.items()}

    def _fetch_many(self, wants: dict) -> dict:
        """{level: indices} -> {(level, index): digest bytes}.

        Lanes path: ONE jitted multi-level gather + ONE host transfer for the
        whole request (a per-level eager fetch costs a relay round-trip per
        tree level — ~20 per decommitted tree)."""
        wants = {lvl: sorted(set(ix)) for lvl, ix in wants.items() if ix}
        if not wants:
            return {}
        if not self.device_lanes:
            return {(lvl, i): _digest_at(self.levels[lvl], i, self._be)
                    for lvl, ix in wants.items() for i in ix}
        order = sorted(wants)
        key = (len(self.levels), tuple((lvl, len(wants[lvl]))
                                       for lvl in order))
        if key not in _GATHER_PROGRAMS:
            def prog(levels, idxs):
                return jnp.concatenate(
                    [lv[:, ix] for lv, ix in zip(levels, idxs)], axis=1)
            _GATHER_PROGRAMS[key] = jax.jit(prog)
        packed = _GATHER_PROGRAMS[key](
            [self.levels[lvl] for lvl in order],
            [jnp.asarray(np.asarray(self._storage_ix(lvl, wants[lvl]),
                                    np.int32)) for lvl in order])
        block = np.asarray(packed, dtype=np.uint32)  # (8, K)
        bo = "big" if self._be else "little"
        out = {}
        col = 0
        for lvl in order:
            for i in wants[lvl]:
                out[(lvl, i)] = b"".join(
                    int(w).to_bytes(4, bo) for w in block[:, col])
                col += 1
        return out

    def root(self) -> bytes:
        if self._root is None:
            self._root = self._fetch(len(self.levels) - 1, [0])[0]
        return self._root

    def leaf(self, i: int) -> bytes:
        return self._fetch(0, [i])[i]

    def node(self, level: int, i: int) -> bytes:
        """level 0 = leaves."""
        return self._fetch(level, [i])[i]

    # -- multi-proof generation (queue algorithm, src/merkle.rs:149-207) -----

    def _plan(self, idx: list[int]):
        """Queue simulation on indices only: returns (initial leaf indices,
        sibling leaf indices, internal-node flat indices) in emission order."""
        n = self.n
        initial: list[int] = []
        siblings: list[int] = []
        node_queue: list[int] = []
        qi = 0
        leaf_queue = list(idx)
        while qi < len(leaf_queue):
            index = leaf_queue[qi]
            qi += 1
            initial.append(index)
            node_queue.append((n + index) >> 1)
            if qi < len(leaf_queue) and leaf_queue[qi] == index ^ 1:
                initial.append(index ^ 1)
                qi += 1
                continue
            siblings.append(index ^ 1)

        flat_nodes: list[int] = []
        qn = 0
        while qn < len(node_queue):
            index = node_queue[qn]
            qn += 1
            if index > 2:
                node_queue.append(index >> 1)
            if qn < len(node_queue) and node_queue[qn] == index ^ 1:
                qn += 1
                continue
            flat_nodes.append(index ^ 1)
        return initial, siblings, flat_nodes

    def prove(self, indices: list[int]) -> MerkleView:
        n = self.n
        for i in indices:
            if i >= n:
                raise IndexError(f"leaf index {i} out of bounds for {n} leaves")
        meta, specs = self.fetch_plan(indices)
        if specs is None:
            return self.view_from(meta, None)
        return self.view_from(meta, fetch_bundle(specs))

    def fetch_plan(self, indices: list[int]):
        """Plan a multi-proof decommit: returns (meta, specs) where specs
        feed fetch_bundle (None on the host-numpy path) and
        view_from(meta, blocks) builds the MerkleView — so callers can batch
        MANY trees' decommits into one device round-trip."""
        idx = sorted(set(indices))
        initial, siblings, flat_nodes = self._plan(idx)

        wants: dict[int, set[int]] = {0: set(initial) | set(siblings)}
        for flat in flat_nodes:
            if flat == 0:
                continue
            depth = flat.bit_length() - 1
            wants.setdefault(self.height - depth, set()).add(
                flat - (1 << depth))
        order = sorted(wants)
        wants_sorted = {lvl: sorted(wants[lvl]) for lvl in order}
        meta = (initial, siblings, flat_nodes, order, wants_sorted)
        if not self.device_lanes:
            return meta, None
        specs = [([self.levels[lvl]], self._storage_ix(lvl, wants_sorted[lvl]),
                  1) for lvl in order]
        return meta, specs

    def view_from(self, meta, blocks) -> MerkleView:
        initial, siblings, flat_nodes, order, wants_sorted = meta
        got = {}
        if blocks is None:
            for lvl, ix in wants_sorted.items():
                for i in ix:
                    got[(lvl, i)] = _digest_at(self.levels[lvl], i, self._be)
        else:
            bo = "big" if self._be else "little"
            for j, lvl in enumerate(order):
                block = blocks[j][0]  # (8, k)
                for c, i in enumerate(wants_sorted[lvl]):
                    got[(lvl, i)] = b"".join(
                        int(w).to_bytes(4, bo) for w in block[:, c])

        def node_bytes(flat: int) -> bytes:
            # flat == 0 only occurs for the degenerate 2-leaf tree, where the
            # reference emits its default (all-zero) digest for the unused slot
            if flat == 0:
                return H.ZERO_DIGEST
            depth = flat.bit_length() - 1
            return got[(self.height - depth, flat - (1 << depth))]

        return MerkleView(
            [node_bytes(f) for f in flat_nodes],
            [got[(0, i)] for i in initial],
            [got[(0, i)] for i in siblings],
            self.height,
        )


def _digest_at(level: np.ndarray, i: int, be: bool = True) -> bytes:
    return b"".join(int(w).to_bytes(4, "big" if be else "little")
                    for w in level[i])


# ---------------------------------------------------------------------------
# verification (host; mirrors src/merkle.rs:209-288, 363-385)
# ---------------------------------------------------------------------------

class InvalidProof(Exception):
    pass


_NATIVE_VIEW_ERRS = {
    1: "leaf index out of bounds", 2: "missing sibling leaf",
    3: "extra sibling leaves", 4: "malformed proof", 5: "root mismatch",
    6: "missing node", 7: "proof did not reach root"}


def verify_view(root: bytes, proof: MerkleView, indices: list[int],
                hashfn=H) -> None:
    height = proof.height
    n = 1 << height
    for i in indices:
        if i >= n:
            raise InvalidProof(f"leaf index {i} out of bounds")
    idx = sorted(set(indices))
    if len(idx) != len(proof.initial_leaves):
        raise InvalidProof("wrong number of leaves")

    if hashfn is H:
        from . import native
        rc = native.mk_verify_view(root, height, idx, proof.initial_leaves,
                                   proof.sibling_leaves, proof.nodes)
        if rc is not None:
            if rc != 0:
                raise InvalidProof(_NATIVE_VIEW_ERRS[rc])
            return

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
            node_queue.append((node_index, hashfn.merge(leaf, leaf_queue[qi][1])))
            qi += 1
            continue
        if si >= len(siblings):
            raise InvalidProof("missing sibling leaf")
        sib = siblings[si]
        si += 1
        h = hashfn.merge(leaf, sib) if index % 2 == 0 else hashfn.merge(sib, leaf)
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
            node_queue.append((index >> 1, hashfn.merge(h, node_queue[qn][1])))
            qn += 1
            continue
        if ni >= len(nodes):
            raise InvalidProof("missing node")
        sib = nodes[ni]
        ni += 1
        nh = hashfn.merge(h, sib) if index % 2 == 0 else hashfn.merge(sib, h)
        node_queue.append((index >> 1, nh))
    raise InvalidProof("proof did not reach root")


def verify_rows(root: bytes, row_ids: list[int], rows: list, proof: MerkleView,
                hashfn=H) -> None:
    """Verify matrix rows: dedupe/sort by id, hash each row with
    hash_elements, compare to initial leaves, then verify paths
    (src/merkle.rs:363-385)."""
    inst = sorted({rid: row for rid, row in zip(row_ids, rows)}.items())
    indices = [rid for rid, _ in inst]
    leaves = [hashfn.hash_elements(row) for _, row in inst]
    if leaves != proof.initial_leaves:
        raise InvalidProof("row hash mismatch")
    verify_view(root, proof, indices, hashfn)


# ---------------------------------------------------------------------------
# matrix commitment helper (bit-reversed row order)
# ---------------------------------------------------------------------------

_COMMIT_PROGRAMS: dict = {}


def tree_levels_lanes(lanes, interpret: bool = False) -> list:
    """All tree levels from (8, n) lane-major digest words; jit-traceable.
    NATURAL storage order: each level pairs (2i, 2i+1) — the even/odd lane
    slices force a full relayout pass per level (measured 296 ms of a
    394 ms comp-commit at 2^23 leaves).  Prefer tree_levels_lanes_br."""
    from .ops import sha256_pallas as spl

    levels = [lanes]
    cur = lanes
    while cur.shape[1] > 1:
        cur = spl.merge_lanes(cur[:, 0::2], cur[:, 1::2], interpret=interpret)
        levels.append(cur)
    return levels


def tree_levels_lanes_br(lanes, interpret: bool = False) -> list:
    """All tree levels in TREE-BITREV storage order: storage column p of a
    level holds node bitrev(p).  Siblings (2j, 2j+1) then live at storage
    q and q + half (LSB becomes MSB), so every level is one merge of two
    CONTIGUOUS halves — no strided lane slicing anywhere.  Bonus
    cancellation: for the protocol's bit-reversed leaf order, the bitrev
    storage of the leaf level IS the natural row-digest array (rev∘rev),
    so the commit-time digest permute disappears too."""
    from .ops import sha256_pallas as spl

    levels = [lanes]
    cur = lanes
    while cur.shape[1] > 1:
        half = cur.shape[1] // 2
        cur = spl.merge_lanes(cur[:, :half], cur[:, half:],
                              interpret=interpret)
        levels.append(cur)
    return levels


def commit_matrix_fp_traced(lo, hi, bitrev: bool, interpret: bool) -> list:
    """Traced commit body (lanes path): row hash + all tree levels, in
    TREE-BITREV storage order (wrap with bitrev_storage=True).  `bitrev`
    (leaves = bit-reversed rows, the protocol order) needs NO permute at
    all — natural row digests ARE that tree's bitrev storage; rows already
    given in leaf order need one digest permute."""
    from .ops import sha256_pallas as spl

    lanes = spl.hash_rows_fp_lanes(lo, hi, interpret=interpret)
    if not bitrev:
        lanes = permute_bitrev(lanes, axis=1)
    return tree_levels_lanes_br(lanes, interpret)


def commit_matrix_ext3_traced(c0, c1, c2, bitrev: bool,
                              interpret: bool) -> list:
    from .ops import sha256_pallas as spl

    lanes = spl.hash_rows_ext3_lanes(c0, c1, c2, interpret=interpret)
    if not bitrev:
        lanes = permute_bitrev(lanes, axis=1)
    return tree_levels_lanes_br(lanes, interpret)


def _commit_program(kind: str, shape, bit_reversed_input: bool,
                    interpret: bool):
    """ONE cached jitted program per (matrix kind, shape): row hashing, the
    bit-reverse leaf permutation, and every tree level — a single device
    dispatch instead of ~log2(n)+2 (the eager level-by-level build cost one
    relay round-trip per level)."""
    key = (kind, tuple(shape), bit_reversed_input, interpret)
    if key not in _COMMIT_PROGRAMS:
        bitrev = not bit_reversed_input

        if kind == "fp":
            def prog(lo, hi):
                return commit_matrix_fp_traced(lo, hi, bitrev, interpret)
        else:
            def prog(c0, c1, c2):
                return commit_matrix_ext3_traced(c0, c1, c2, bitrev, interpret)

        _COMMIT_PROGRAMS[key] = jax.jit(prog)
    return _COMMIT_PROGRAMS[key]


def commit_matrix_fp(cols_lo, cols_hi, bit_reversed_input: bool = False,
                     hashfn=H) -> CommittedMerkleTree:
    """Commit to an Fp matrix whose columns are given in NATURAL domain order
    (ncols, n); leaves follow the protocol's bit-reversed row order by
    permuting the row digests.  `hashfn` selects the tree hash (SHA-256
    default, RPO-256 via hash_rpo) — the reference's MerkleTree associated
    type (src/stark.rs:25-35)."""
    if hashfn is not H:
        key = ("rpo-fp", tuple(cols_lo.shape), bit_reversed_input)
        if key not in _COMMIT_PROGRAMS:
            def prog(lo, hi):
                digests = hash_rows_fp_rpo(lo, hi)
                # tree-bitrev storage: natural rows = storage directly
                # (rev∘rev); already-bit-reversed input needs one permute
                if bit_reversed_input:
                    digests = permute_bitrev(digests, axis=0)
                return _rpo_tree_levels_traced_br(digests)

            _COMMIT_PROGRAMS[key] = jax.jit(prog)
        return CommittedMerkleTree(_COMMIT_PROGRAMS[key](cols_lo, cols_hi),
                                   hashfn=hashfn, device_lanes=True,
                                   bitrev_storage=True)
    mode = _lanes_mode()
    if mode is not None:
        prog = _commit_program("fp", cols_lo.shape, bit_reversed_input,
                               mode == "interpret")
        return CommittedMerkleTree(prog(cols_lo, cols_hi), device_lanes=True,
                                   bitrev_storage=True)
    digests = hash_rows_fp(cols_lo, cols_hi)
    if not bit_reversed_input:
        digests = permute_bitrev(digests, axis=0)
    return CommittedMerkleTree.from_leaf_words(digests)


def commit_matrix_ext3(c0, c1, c2, bit_reversed_input: bool = False,
                       hashfn=H) -> CommittedMerkleTree:
    if hashfn is not H:
        key = ("rpo-ext3", tuple(c0[0].shape), bit_reversed_input)
        if key not in _COMMIT_PROGRAMS:
            def prog(a0, a1, a2):
                digests = hash_rows_ext3_rpo(a0, a1, a2)
                if bit_reversed_input:
                    digests = permute_bitrev(digests, axis=0)
                return _rpo_tree_levels_traced_br(digests)

            _COMMIT_PROGRAMS[key] = jax.jit(prog)
        return CommittedMerkleTree(_COMMIT_PROGRAMS[key](c0, c1, c2),
                                   hashfn=hashfn, device_lanes=True,
                                   bitrev_storage=True)
    mode = _lanes_mode()
    if mode is not None:
        prog = _commit_program("ext3", c0[0].shape, bit_reversed_input,
                               mode == "interpret")
        return CommittedMerkleTree(prog(c0, c1, c2), device_lanes=True,
                                   bitrev_storage=True)
    digests = hash_rows_ext3(c0, c1, c2)
    if not bit_reversed_input:
        digests = permute_bitrev(digests, axis=0)
    return CommittedMerkleTree.from_leaf_words(digests)
