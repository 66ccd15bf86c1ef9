"""ark_std::test_rng() replication (ministark_tpu.ark_rng).

Pinned against PUBLIC vectors independent of this repo's implementation:
the IETF ChaCha20 block-function vector and rand 0.8.5's StdRng
value-stability test (rand/src/rngs/std.rs `test_stdrng_construction`),
plus the derived brainfuck permutation initials consumed by
models/brainfuck/trace.py (reference: examples/brainfuck/trace.rs:82-84).
"""

from ministark_tpu.ark_rng import (
    ARK_TEST_RNG_SEED,
    ChaCha12Rng,
    _chacha_block,
    rand_fp,
    rand_fq3,
    test_rng as ark_test_rng,
)
from ministark_tpu.fields.scalar import P


def test_chacha20_block_ietf_vector():
    # draft-nir-cfrg-chacha20-poly1305 test vector: zero key, zero nonce,
    # block counter 0, 20 rounds
    out = _chacha_block([0] * 8, 0, 20)
    assert out == [
        0xADE0B876, 0x903DF1A0, 0xE56A5D40, 0x28BD8653,
        0xB819D2BD, 0x1AED8DA0, 0xCCEF36A8, 0xC70D778B,
        0x7C5941DA, 0x8D485751, 0x3FE02477, 0x374AD8B8,
        0xF4B8436A, 0x1CA11815, 0x69B687C3, 0x8665EEB2,
    ]


def test_stdrng_value_stability_vector():
    # rand 0.8.5 test_stdrng_construction: StdRng = ChaCha12Rng
    seed = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0]
                 + [0] * 16)
    rng = ChaCha12Rng(seed)
    assert rng.next_u64() == 10719222850664546238


def test_next_u64_block_straddle():
    """BlockRng::next_u64 at the buffer edge: last word of one refill joins
    the first word of the next (low half first)."""
    rng = ChaCha12Rng(ARK_TEST_RNG_SEED)
    for _ in range(63):
        rng.next_u32()
    straddled = rng.next_u64()

    ref = ChaCha12Rng(ARK_TEST_RNG_SEED)
    words = [ref.next_u32() for _ in range(65)]
    assert straddled == words[63] | (words[64] << 32)


def test_fp_rand_is_montgomery_rejection():
    rng = ark_test_rng()
    raw = rng.next_u64()
    assert raw < P  # first draw of this stream happens to land below p
    r_inv = pow(1 << 64, P - 2, P)
    assert rand_fp(ark_test_rng()).v == raw * r_inv % P


def test_brainfuck_initials_pinned():
    """The two Fq3 draws trace.py seeds the permutation arguments with."""
    rng = ark_test_rng()
    instr = rand_fq3(rng)
    mem = rand_fq3(rng)
    assert (instr.c0.v, instr.c1.v, instr.c2.v) == (
        0x05C8B970ACB23290, 0x11369A99B84E08DD, 0x60DB97D60ECEF488)
    assert (mem.c0.v, mem.c1.v, mem.c2.v) == (
        0xBB7DE6D27B4302CC, 0xFB12439614776779, 0x25A7A95A8416C2FD)

    from ministark_tpu.models.brainfuck.trace import (INSTR_PERM_INITIAL,
                                                      MEM_PERM_INITIAL)
    assert (INSTR_PERM_INITIAL.c0.v, INSTR_PERM_INITIAL.c1.v,
            INSTR_PERM_INITIAL.c2.v) == (instr.c0.v, instr.c1.v, instr.c2.v)
    assert (MEM_PERM_INITIAL.c0.v, MEM_PERM_INITIAL.c1.v,
            MEM_PERM_INITIAL.c2.v) == (mem.c0.v, mem.c1.v, mem.c2.v)
