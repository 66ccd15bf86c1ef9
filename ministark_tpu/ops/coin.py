"""Device-side Fiat-Shamir coin steps (reference: src/random.rs:88-156).

The host ``PublicCoin`` (random.py) stays the source of truth for proof
bytes; these traced helpers replicate the two coin operations a fused FRI
pipeline needs BETWEEN Merkle commits, so every fold layer no longer pays a
relay round-trip for its 32-byte root before the next fold can start:

* ``reseed`` — seed' = sha256(seed || digest)  (src/random.rs:96-99);
* ``draw``   — ark ``Fp::rand``: pop u64s big-endian from the END of
  sha256(seed' || counter_be) digests, reject while >= p, and interpret the
  accepted limb as Montgomery form (canonical = u * R^{-1} mod p)
  (src/random.rs:147-179 + random.py's vendored note in docs/ark_compat.md).

Rejection handling: one digest yields 4 candidate u64s in pop order; we
evaluate 2 digests (counters 1, 2) = 8 candidates and select the first
accepted ones.  A Goldilocks candidate rejects with probability
(2^32-1)/2^64 < 2^-32, so >= 6 rejections among 8 candidates — the only
case this vectorized selection cannot represent — has probability < 2^-192.
The prover cross-checks every device draw against the host coin replay and
raises if they ever diverge, so even that event is loud, not silent.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import sha256 as dsha
from ..fields import device as fd
from ..fields.scalar import R_MONT_INV

_COUNTERS_12 = np.array([[0, 1], [0, 2]], dtype=np.uint32)  # u64 BE word pairs


def reseed(seed_words, digest_words):
    """seed' = sha256(seed || digest); both (8,) BE u32 words."""
    return dsha.merge_words(seed_words, digest_words)


def draw_fps(seed_words, k: int) -> list[fd.Fp2]:
    """The first k canonical Fp draws after a reseed (counter starts at 1).

    Returns k scalar (lo, hi) pairs — the same layout fri._alpha_device
    produces from a host-drawn scalar.  k <= 5 (one Fq3 draw needs 3)."""
    assert 1 <= k <= 5
    digs = dsha.merge_with_int_words(seed_words, jnp.asarray(_COUNTERS_12))
    los, his = [], []
    for d in range(2):
        for c in range(4):  # pop order: bytes 31..24 first => words (7,6)
            los.append(dsha.byteswap32(digs[d, 6 - 2 * c]))
            his.append(dsha.byteswap32(digs[d, 7 - 2 * c]))
    lo, hi = jnp.stack(los), jnp.stack(his)  # (8,) candidates in pop order
    # u64 < p=2^64-2^32+1  <=>  hi != 0xFFFFFFFF or lo == 0
    valid = (hi != jnp.uint32(0xFFFFFFFF)) | (lo == jnp.uint32(0))
    vi = valid.astype(jnp.int32)
    rank = jnp.cumsum(vi) * vi  # accepted candidates get 1-based ranks
    rinv = fd.full((), R_MONT_INV)
    out = []
    for j in range(k):
        m = rank == (j + 1)
        u = (jnp.max(jnp.where(m, lo, jnp.uint32(0))),
             jnp.max(jnp.where(m, hi, jnp.uint32(0))))
        out.append(fd.mul(u, rinv))  # Montgomery limb -> canonical
    return out


def seed_to_words(seed: bytes):
    return jnp.asarray(dsha.digest_bytes_to_words_np([seed])[0])


def alpha_canonical_int(a) -> int:
    """Host value of a drawn (lo, hi) scalar (for the replay cross-check)."""
    return int(np.asarray(a[0])) | (int(np.asarray(a[1])) << 32)
