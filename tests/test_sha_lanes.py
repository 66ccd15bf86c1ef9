"""Parity tests for the lanes SHA-256 Pallas kernel (ops/sha256_pallas.py)
against hashlib, in interpret mode on CPU.

Covers every layout/padding branch of sha256_words_lanes:
  * sublane-packed (W, 8, n/8) path (n % 1024 == 0) vs plain (W, n) 2D path;
  * padding entirely const-folded (W=16 Merkle merge: 1 data + 1 const block);
  * padding carried in VMEM within the data block (W=6 leaf rows);
  * mixed: multiple data blocks + carried rows + const block (W=30).

Reference counterpart: src/merkle.rs:412-508 row hashing / gpu hash kernels.
"""

import hashlib

import numpy as np
import pytest

from ministark_tpu.ops import sha256_pallas as spl


def _expected(words):
    """hashlib digests of word-major (W, n) uint32 BE-word messages."""
    W, n = words.shape
    out = np.empty((8, n), dtype=np.uint32)
    host = np.asarray(words, dtype=np.uint32)
    for i in range(n):
        msg = b"".join(int(host[k, i]).to_bytes(4, "big") for k in range(W))
        d = hashlib.sha256(msg).digest()
        out[:, i] = [int.from_bytes(d[4 * k:4 * k + 4], "big")
                     for k in range(8)]
    return out


@pytest.mark.parametrize("W,n", [
    (16, 1024),  # Merkle merge shape, packed path, pure-const 2nd block
    (16, 256),   # Merkle merge shape, 2D path
    (6, 1024),   # 3-col Fp leaf rows, packed, carried padding only
    (6, 200),    # 2D path with a non-128 tile
    (30, 1024),  # 2 data blocks + carried rows + 1 const block, packed
    (30, 64),    # same schedule split, 2D
])
def test_lanes_matches_hashlib(W, n, no_persistent_cache):
    rng = np.random.default_rng(W * 100003 + n)
    words = rng.integers(0, 1 << 32, size=(W, n), dtype=np.uint64)
    words = words.astype(np.uint32)
    import jax.numpy as jnp

    got = np.asarray(spl.sha256_words_lanes(jnp.asarray(words),
                                            interpret=True))
    np.testing.assert_array_equal(got, _expected(words))


def test_merge_lanes_matches_hashlib(no_persistent_cache):
    rng = np.random.default_rng(7)
    import jax.numpy as jnp

    left = jnp.asarray(rng.integers(0, 1 << 32, (8, 128), np.uint64)
                       .astype(np.uint32))
    right = jnp.asarray(rng.integers(0, 1 << 32, (8, 128), np.uint64)
                        .astype(np.uint32))
    got = np.asarray(spl.merge_lanes(left, right, interpret=True))
    words = np.concatenate([np.asarray(left), np.asarray(right)], axis=0)
    np.testing.assert_array_equal(got, _expected(words))
