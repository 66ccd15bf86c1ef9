"""Device proof-of-work grind (reference: src/random.rs:48-55).

Vectorized nonce search: sha256(seed || nonce_be) for a batch of nonces at a
time, returning the SMALLEST valid nonce (deterministic, unlike the
reference's rayon find_any — any valid nonce verifies)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import sha256 as dsha


@jax.jit
def _grind_batch(seed_words, start_hi, start_lo, bits):
    """Check BATCH consecutive nonces from start; return index of first
    valid or -1."""
    n = _BATCH
    idx = jnp.arange(n, dtype=jnp.uint32)
    lo = start_lo + idx
    carry = (lo < start_lo).astype(jnp.uint32)
    hi = start_hi + carry
    nonces = jnp.stack([hi, lo], axis=-1)  # BE words: high then low
    digests = dsha.merge_with_int_words(seed_words, nonces)
    lz = dsha.leading_zero_bits(digests)
    ok = lz >= bits
    first = jnp.argmax(ok)
    return jnp.where(jnp.any(ok), first, -1)


# Sized so a grind-20 search (~2^20 expected nonces) usually takes ONE
# dispatch: each batch round-trip costs ~40 ms through the relay, which
# dominated the PoW phase at 2^16 (16 batches = 670 ms measured on the
# brainfuck hello_world config; the hash kernel itself is ~3 ms/2^20).
_BATCH = 1 << 21


def grind(seed: bytes, bits: int) -> int:
    """Find the smallest nonce >= 1 with leading_zeros(sha256(seed||nonce)) >= bits."""
    seed_words = jnp.asarray(dsha.digest_bytes_to_words_np([seed])[0])
    start = 1
    while True:
        idx = int(_grind_batch(
            seed_words,
            jnp.uint32(start >> 32),
            jnp.uint32(start & 0xFFFFFFFF),
            jnp.int32(bits),
        ))
        if idx >= 0:
            return start + idx
        start += _BATCH


# -- RPO-coin grind (hash_rpo.merge_with_int semantics) ----------------------

_RPO_BATCH = 1 << 16  # 12-wide state + 14 MDS einsums per permute: heavier


@jax.jit
def _grind_rpo_batch(seed_lo, seed_hi, start_hi, start_lo, bits):
    """RPO PoW: digest = rpo_permute(state) with state[0]=1 (padding flag),
    rate = [seed digest elems | nonce_lo32 | nonce_hi32 | 1 | 0]
    (hash_rpo.merge_with_int).  Leading zeros count the digest's canonical
    LE byte stream, so each u64 element contributes byteswap32(lo) then
    byteswap32(hi) to the big-endian word view."""
    from . import rpo256

    n = _RPO_BATCH
    idx = jnp.arange(n, dtype=jnp.uint32)
    nlo = start_lo + idx
    carry = (nlo < start_lo).astype(jnp.uint32)
    nhi = start_hi + carry

    lo = jnp.zeros((n, rpo256.STATE_WIDTH), jnp.uint32)
    hi = jnp.zeros((n, rpo256.STATE_WIDTH), jnp.uint32)
    lo = lo.at[:, 0].set(1)  # 6 rate elements -> padding rule applies
    for i in range(4):
        lo = lo.at[:, rpo256.CAPACITY + i].set(seed_lo[i])
        hi = hi.at[:, rpo256.CAPACITY + i].set(seed_hi[i])
    lo = lo.at[:, 8].set(nlo)   # nonce as two u32 field elements
    lo = lo.at[:, 9].set(nhi)
    lo = lo.at[:, 10].set(1)    # padding: single 1 then zeros
    dg = rpo256.digest(rpo256.permute((lo, hi)))  # (n, 4) limb pairs

    words = jnp.stack(
        [dsha.byteswap32(dg[0][:, i // 2]) if i % 2 == 0
         else dsha.byteswap32(dg[1][:, i // 2]) for i in range(8)], axis=-1)
    lz = dsha.leading_zero_bits(words)
    ok = lz >= bits
    first = jnp.argmax(ok)
    return jnp.where(jnp.any(ok), first, -1)


def grind_rpo(seed: bytes, bits: int) -> int:
    """Smallest nonce >= 1 with leading_zeros(rpo_merge_with_int(seed,
    nonce)) >= bits — the device grind for RPO-coin configurations (the
    host fallback is a pure-Python permutation per nonce: ~1 ms each,
    untenable at the reference's grind-20 workloads)."""
    vals = [int.from_bytes(seed[8 * i:8 * i + 8], "little") for i in range(4)]
    seed_lo = jnp.asarray(np.array([v & 0xFFFFFFFF for v in vals], np.uint32))
    seed_hi = jnp.asarray(np.array([v >> 32 for v in vals], np.uint32))
    start = 1
    while True:
        idx = int(_grind_rpo_batch(
            seed_lo, seed_hi,
            jnp.uint32(start >> 32),
            jnp.uint32(start & 0xFFFFFFFF),
            jnp.int32(bits),
        ))
        if idx >= 0:
            return start + idx
        start += _RPO_BATCH
