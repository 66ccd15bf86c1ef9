"""Batched SHA-256 on device (uint32 VPU ops).

TPU-native replacement for the reference's rayon row-hashing
(src/merkle.rs:412-436) and PoW nonce grind (src/random.rs:48-55): thousands
to millions of independent fixed-length messages are hashed in one vectorized
pass.  All messages the protocol hashes on-device are word-aligned
(field elements are 8-byte LE; digests are 32 bytes), so the message builders
work on uint32 words:

* field-element LE bytes -> big-endian SHA words via byteswap of each limb;
* padding is appended per the fixed message length (static at trace time).

Verified bit-for-bit against hashlib in tests/test_sha256.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_K = np.array([
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
], dtype=np.uint32)

_H0 = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def byteswap32(x):
    """uint32 byte swap (LE limb -> BE SHA word)."""
    return ((x >> 24) | ((x >> 8) & 0xFF00) | ((x & 0xFF00) << 8) | (x << 24)).astype(U32)


def _compress(state, block):
    """One SHA-256 compression. state: (..., 8); block: (..., 16) uint32.

    Both the message schedule and the 64 rounds are `fori_loop`s: fully
    unrolled uint32 graphs send XLA:CPU's algebraic simplifier into a
    circular-rewrite loop (minutes-long compiles); the loop form compiles in
    well under a second per shape and runs at the same speed."""
    batch = block.shape[:-1]
    w0 = jnp.concatenate([block, jnp.zeros((*batch, 48), U32)], axis=-1)

    def sched_body(t, w):
        wm15 = w[..., t - 15]
        wm2 = w[..., t - 2]
        s0 = _rotr(wm15, 7) ^ _rotr(wm15, 18) ^ (wm15 >> 3)
        s1 = _rotr(wm2, 17) ^ _rotr(wm2, 19) ^ (wm2 >> 10)
        v = (w[..., t - 16] + s0 + w[..., t - 7] + s1).astype(U32)
        return jax.lax.dynamic_update_index_in_dim(w, v, t, w.ndim - 1)

    w = jax.lax.fori_loop(16, 64, sched_body, w0)
    k = jnp.asarray(_K)

    def round_body(t, st):
        a, b, c, d, e, f, g, h = st
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + k[t] + w[..., t]).astype(U32)
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return ((t1 + S0 + maj).astype(U32), a, b, c,
                (d + t1).astype(U32), e, f, g)

    st = jax.lax.fori_loop(0, 64, round_body,
                           tuple(state[..., i] for i in range(8)))
    out = jnp.stack(st, axis=-1)
    return (state + out).astype(U32)


@jax.jit
def sha256_words(words):
    """SHA-256 of word-aligned messages.

    words: (..., W) uint32 big-endian words (message length = 4*W bytes).
    Returns (..., 8) uint32 digest words.  W is static so padding is static.
    """
    W = words.shape[-1]
    batch = words.shape[:-1]
    # padded length: smallest multiple of 16 words >= W + 1 (0x80 word) + 2 (length)
    total_words = ((W + 3 + 15) // 16) * 16
    bitlen = W * 32
    pad = np.zeros(total_words - W, dtype=np.uint32)
    pad[0] = 0x80000000
    pad[-2] = (bitlen >> 32) & 0xFFFFFFFF
    pad[-1] = bitlen & 0xFFFFFFFF
    padv = jnp.broadcast_to(jnp.asarray(pad, U32), (*batch, total_words - W))
    msg = jnp.concatenate([words.astype(U32), padv], axis=-1)

    # derive the initial state from the input so its sharding/varying type
    # matches inside shard_map bodies (broadcasting a constant does not)
    state = jnp.asarray(_H0, U32) + jnp.zeros_like(msg[..., :8])
    nblocks = total_words // 16
    for i in range(nblocks):
        state = _compress(state, msg[..., i * 16:(i + 1) * 16])
    return state


def digest_words_to_bytes_np(dw) -> list[bytes]:
    """(batch, 8) uint32 digest words -> list of 32-byte digests."""
    arr = np.asarray(dw, dtype=np.uint32)
    flat = arr.reshape(-1, 8)
    out = []
    for row in flat:
        out.append(b"".join(int(w).to_bytes(4, "big") for w in row))
    return out


def digest_bytes_to_words_np(digests: list[bytes]) -> np.ndarray:
    out = np.zeros((len(digests), 8), dtype=np.uint32)
    for i, d in enumerate(digests):
        for j in range(8):
            out[i, j] = int.from_bytes(d[4 * j:4 * j + 4], "big")
    return out


def fp_rows_to_words(row_lo, row_hi):
    """(..., ncols) Fp limb arrays (one row per batch element) -> SHA word
    arrays (..., 2*ncols): LE value bytes become words [bswap(lo), bswap(hi)]."""
    lo = byteswap32(row_lo)
    hi = byteswap32(row_hi)
    stacked = jnp.stack([lo, hi], axis=-1)  # (..., ncols, 2)
    return stacked.reshape(*row_lo.shape[:-1], row_lo.shape[-1] * 2)


def merge_words(left, right):
    """Merkle node hash: digests (..., 8) each -> (..., 8)."""
    return sha256_words(jnp.concatenate([left, right], axis=-1))


def merge_with_int_words(seed_words, nonces):
    """sha256(seed || nonce_be) batched over nonces.

    seed_words: (8,) uint32; nonces: (n,) uint32 pair arrays or uint64-like
    (n, 2) [hi, lo] uint32. Returns (n, 8)."""
    n = nonces.shape[0]
    seed = jnp.broadcast_to(seed_words, (n, 8))
    return sha256_words(jnp.concatenate([seed, nonces], axis=-1))


@jax.jit
def leading_zero_bits(digest_words):
    """Count leading zero bits of (..., 8) digest words."""
    # clz per word via float trick is messy; use iterative compare
    dw = digest_words
    batch = dw.shape[:-1]
    total = jnp.zeros(batch, jnp.int32)
    still = jnp.ones(batch, bool)
    for j in range(8):
        w = dw[..., j]
        clz = _clz32(w)
        total = total + jnp.where(still, clz, 0)
        still = still & (w == 0)
    return total


def _clz32(x):
    """Count leading zeros of uint32."""
    n = jnp.zeros(x.shape, jnp.int32)
    cur = x
    for shift in [16, 8, 4, 2, 1]:
        # if the top `shift` bits are empty, shift left and count them
        empty = cur < jnp.uint32(1 << (32 - shift))
        n = n + jnp.where(empty, shift, 0)
        cur = jnp.where(empty, cur << shift, cur)
    return jnp.where(x == 0, 32, n)
