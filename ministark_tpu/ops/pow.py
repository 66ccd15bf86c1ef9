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


_BATCH = 1 << 16


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
