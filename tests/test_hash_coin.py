"""Device SHA-256 vs hashlib, and public-coin transcript golden tests.

The coin goldens are computed inline from first principles (hashlib +
documented algorithms), acting as an independent re-derivation of the
transcript rules in src/random.rs."""

import hashlib

import numpy as np
import jax.numpy as jnp

from ministark_tpu import hash as H
from ministark_tpu.fields import Fp, Fq3, P
from ministark_tpu.fields.scalar import R_MONT_INV
from ministark_tpu.ops import sha256 as dsha
from ministark_tpu.random import PublicCoin


RNG = np.random.default_rng(7)


class TestDeviceSha256:
    def test_word_aligned_messages(self):
        for nwords in [2, 8, 10, 14, 16, 17, 32]:
            batch = 5
            words = RNG.integers(0, 2**32, size=(batch, nwords), dtype=np.uint32)
            got = dsha.digest_words_to_bytes_np(dsha.sha256_words(jnp.asarray(words)))
            for b in range(batch):
                msg = b"".join(int(w).to_bytes(4, "big") for w in words[b])
                assert got[b] == hashlib.sha256(msg).digest(), f"nwords={nwords}"

    def test_fp_row_hash_matches_hash_elements(self):
        # 8-column Fp row, like the fib example's leaf hash
        ncols, batch = 8, 4
        vals = RNG.integers(0, P, size=(batch, ncols), dtype=np.uint64)
        lo = (vals & 0xFFFFFFFF).astype(np.uint32)
        hi = (vals >> 32).astype(np.uint32)
        words = dsha.fp_rows_to_words(jnp.asarray(lo), jnp.asarray(hi))
        got = dsha.digest_words_to_bytes_np(dsha.sha256_words(words))
        for b in range(batch):
            want = H.hash_elements([Fp(int(v)) for v in vals[b]])
            assert got[b] == want

    def test_merge_words(self):
        d0, d1 = hashlib.sha256(b"a").digest(), hashlib.sha256(b"b").digest()
        w0 = jnp.asarray(dsha.digest_bytes_to_words_np([d0]))
        w1 = jnp.asarray(dsha.digest_bytes_to_words_np([d1]))
        got = dsha.digest_words_to_bytes_np(dsha.merge_words(w0, w1))[0]
        assert got == H.merge(d0, d1)

    def test_leading_zero_bits(self):
        cases = [
            b"\x00" * 32,
            b"\x00\x01" + b"\xff" * 30,
            b"\x80" + b"\x00" * 31,
            b"\x01" + b"\x00" * 31,
        ]
        words = jnp.asarray(dsha.digest_bytes_to_words_np(cases))
        got = [int(x) for x in dsha.leading_zero_bits(words)]
        want = [H.leading_zeros(c) for c in cases]
        assert got == want


class TestPublicCoin:
    def test_byte_stream_pops_from_end(self):
        seed = hashlib.sha256(b"seed").digest()
        coin = PublicCoin(seed)
        # first refill: counter=1 -> sha256(seed || 1u64be); bytes pop from END
        d = hashlib.sha256(seed + (1).to_bytes(8, "big")).digest()
        got = coin.fill_bytes(4)
        assert got == bytes([d[31], d[30], d[29], d[28]])
        # u64 big-endian from subsequent pops
        u = coin.next_u64()
        want = int.from_bytes(bytes(d[27 - i] for i in range(8)), "big")
        assert u == want

    def test_refill_increments_counter(self):
        seed = hashlib.sha256(b"x").digest()
        coin = PublicCoin(seed)
        coin.fill_bytes(32)  # exhausts first digest
        d2 = hashlib.sha256(seed + (2).to_bytes(8, "big")).digest()
        assert coin.next_byte() == d2[31]

    def test_reseed_resets(self):
        seed = hashlib.sha256(b"x").digest()
        coin = PublicCoin(seed)
        coin.fill_bytes(5)
        other = hashlib.sha256(b"y").digest()
        coin.reseed_with_digest(other)
        assert coin.seed == hashlib.sha256(seed + other).digest()
        assert coin.counter == 0 and coin.bytes_buf == b""

    def test_reseed_with_field_elements_chains(self):
        seed = hashlib.sha256(b"x").digest()
        coin = PublicCoin(seed)
        vals = [Fp(3), Fp(12345)]
        coin.reseed_with_field_elements(vals)
        s = seed
        for v in vals:
            s = hashlib.sha256(s + hashlib.sha256(v.to_bytes()).digest()).digest()
        assert coin.seed == s

    def test_draw_montgomery_semantics(self):
        seed = hashlib.sha256(b"draw").digest()
        coin = PublicCoin(seed)
        ref = PublicCoin(seed)
        u = ref.next_u64()
        while u >= P:
            u = ref.next_u64()
        assert coin.draw() == Fp(u * R_MONT_INV % P)

    def test_draw_fq3_order(self):
        seed = hashlib.sha256(b"q3").digest()
        coin = PublicCoin(seed, field=Fq3)
        ref = PublicCoin(seed)
        v = coin.draw()
        assert isinstance(v, Fq3)
        assert v.c0 == ref._draw_fp()
        assert v.c1 == ref._draw_fp()
        assert v.c2 == ref._draw_fp()

    def test_gen_range_lemire(self):
        seed = hashlib.sha256(b"range").digest()
        coin = PublicCoin(seed)
        ref = PublicCoin(seed)
        n = 1000
        v = ref.next_u64()
        # power-of-... n=1000: zone = (1000 << 54) - 1
        zone = ((1000 << (64 - 10)) - 1) & 0xFFFFFFFFFFFFFFFF
        while (v * 1000) & 0xFFFFFFFFFFFFFFFF > zone:
            v = ref.next_u64()
        assert coin.gen_range(n) == (v * 1000) >> 64

    def test_draw_queries_sorted_dedup(self):
        seed = hashlib.sha256(b"queries").digest()
        coin = PublicCoin(seed)
        qs = coin.draw_queries(32, 1 << 20)
        assert qs == sorted(set(qs))
        assert all(0 <= q < (1 << 20) for q in qs)
        assert len(qs) <= 32

    def test_pow_roundtrip(self):
        seed = hashlib.sha256(b"pow").digest()
        coin = PublicCoin(seed)
        nonce = coin.grind_proof_of_work(8)
        assert coin.verify_proof_of_work(8, nonce)
        assert not coin.verify_proof_of_work(30, nonce) or H.leading_zeros(
            H.merge_with_int(seed, nonce)) >= 30
