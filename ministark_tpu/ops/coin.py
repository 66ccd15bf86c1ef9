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


# ---------------------------------------------------------------------------
# RPO coin (PublicCoinImpl<F, Rpo256>: merkle_hash = coin_hash = hash_rpo)
# ---------------------------------------------------------------------------
# An RPO digest is 4 CANONICAL Goldilocks elements serialized LE
# (hash_rpo._digest_bytes), and the coin's byte stream pops from the END —
# so each next_u64 is exactly one digest element: big-endian assembly of the
# reversed LE bytes reproduces the element value, in order [e3, e2, e1, e0].
# Elements are always < p, so ark's rejection loop NEVER rejects here; a
# draw is just element * R^{-1} (the Montgomery-limb interpretation, same as
# the SHA coin).  State layout on device: an (8,) u32 word vector
# [e0_lo, e0_hi, ..., e3_lo, e3_hi] — the same interleaving the RPO Merkle
# levels store, so a tree root feeds the coin without reshuffling.


def rpo_seed_to_words(seed: bytes):
    """(8,) u32 interleaved [lo, hi] words of the 4 LE digest elements."""
    return jnp.asarray(np.frombuffer(seed, dtype="<u4").copy())


def _rpo_words_to_state_rate(words_a, words_b):
    """Two 4-element digests -> (1, 8) rate limb planes."""
    lo = jnp.concatenate([words_a[0::2], words_b[0::2]])[None, :]
    hi = jnp.concatenate([words_a[1::2], words_b[1::2]])[None, :]
    return lo, hi


def rpo_reseed(seed_words, digest_words):
    """seed' = hash_rpo.merge(seed, digest); both (8,) interleaved words."""
    from . import rpo256

    state = rpo256._empty_state(1, padded=False)
    d = rpo256.digest(rpo256.absorb_chunk(
        state, _rpo_words_to_state_rate(seed_words, digest_words)))
    return jnp.stack([d[0][0], d[1][0]], axis=1).reshape(8)


def rpo_draw_fps(seed_words, k: int) -> list[fd.Fp2]:
    """First k canonical Fp draws after a reseed (counter 1..): the
    hash_rpo.merge_with_int sponge — rate = seed elements + [counter_lo32,
    counter_hi32] + 1-padding, capacity flag set.  k <= 8 (two digests)."""
    from . import rpo256

    assert 1 <= k <= 8
    los, his = [], []
    slo, shi = seed_words[0::2], seed_words[1::2]
    for counter in range(1, 2 + (k - 1) // 4):
        lo = jnp.concatenate([slo, jnp.asarray(
            np.array([counter, 0, 1, 0], np.uint32))])[None, :]
        hi = jnp.concatenate([shi, jnp.zeros((4,), fd.U32)])[None, :]
        state = rpo256._empty_state(1, padded=True)
        d = rpo256.digest(rpo256.absorb_chunk(state, (lo, hi)))
        for idx in (3, 2, 1, 0):  # pop order: last element first
            los.append(d[0][0, idx])
            his.append(d[1][0, idx])
    rinv = fd.full((), R_MONT_INV)
    return [fd.mul((los[j], his[j]), rinv) for j in range(k)]
