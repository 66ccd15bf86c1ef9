"""Device proof-of-work grind (reference: src/random.rs:48-55).

Vectorized nonce search: sha256(seed || nonce_be) for a batch of nonces at a
time, returning the SMALLEST valid nonce (deterministic, unlike the
reference's rayon find_any — any valid nonce verifies)."""

from __future__ import annotations

import functools

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


def _rpo_batch() -> int:
    # the Pallas permutation kernel sustains much larger batches; the XLA
    # path (CPU tests) keeps a modest one
    return (1 << 20) if jax.default_backend() != "cpu" else (1 << 16)


@functools.partial(jax.jit, static_argnames=("n",))
def _grind_rpo_batch(seed_lo, seed_hi, start_hi, start_lo, bits, n):
    """RPO PoW: digest = rpo_permute(state) with state[0]=1 (padding flag),
    rate = [seed digest elems | nonce_lo32 | nonce_hi32 | 1 | 0]
    (hash_rpo.merge_with_int).  Leading zeros count the digest's canonical
    LE byte stream, so each u64 element contributes byteswap32(lo) then
    byteswap32(hi) to the big-endian word view."""
    from . import rpo256

    idx = jnp.arange(n, dtype=jnp.uint32)
    nlo = start_lo + idx
    carry = (nlo < start_lo).astype(jnp.uint32)
    nhi = start_hi + carry

    if jax.default_backend() != "cpu" and n % 128 == 0:
        # lane-major state straight into the Pallas permutation kernel
        from . import rpo256_pallas as rpl

        zeros = jnp.zeros((n,), jnp.uint32)
        ones = jnp.ones((n,), jnp.uint32)

        def bc(s):
            return jnp.broadcast_to(s, (n,))

        slo = jnp.stack([ones, zeros, zeros, zeros]
                        + [bc(seed_lo[i]) for i in range(4)]
                        + [nlo, nhi, ones, zeros])
        shi = jnp.stack([zeros] * 4 + [bc(seed_hi[i]) for i in range(4)]
                        + [zeros] * 4)
        olo, ohi = rpl.permute_lanes(slo, shi)
        dg = (jnp.transpose(olo[4:8]), jnp.transpose(ohi[4:8]))  # (n, 4)
    else:
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
    batch = _rpo_batch()
    while True:
        idx = int(_grind_rpo_batch(
            seed_lo, seed_hi,
            jnp.uint32(start >> 32),
            jnp.uint32(start & 0xFFFFFFFF),
            jnp.int32(bits),
            n=batch,
        ))
        if idx >= 0:
            return start + idx
        start += batch
