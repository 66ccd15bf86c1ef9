"""NTT tests vs an exact Python oracle (pattern: gpu/tests/shaders.rs, which
checks GPU FFT against the arkworks CPU FFT)."""

import numpy as np
import pytest

from ministark_tpu.fields import Fp, Fq3, P, GENERATOR
from ministark_tpu.fields import device as fd
from ministark_tpu import ntt


RNG = np.random.default_rng(42)


def naive_eval(coeffs, dom: ntt.Domain):
    """O(n^2)-ish oracle: evaluate at offset*g^i via Horner (python ints)."""
    out = []
    for i in range(dom.size):
        x = dom.element(i).v
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [2, 8, 64, 256])
@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_fft_fp_matches_naive(n, offset):
    coeffs = [int(x) for x in RNG.integers(0, P, size=n, dtype=np.uint64)]
    dom = ntt.Domain(n, offset)
    got = fd.to_ints(dom.fft_fp(fd.pack_np(coeffs)))
    assert got == naive_eval(coeffs, dom)


@pytest.mark.parametrize("n", [8, 128])
@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_ifft_roundtrip(n, offset):
    coeffs = [int(x) for x in RNG.integers(0, P, size=n, dtype=np.uint64)]
    dom = ntt.Domain(n, offset)
    evals = dom.fft_fp(fd.pack_np(coeffs))
    back = fd.to_ints(dom.ifft_fp(evals))
    assert back == coeffs


def test_fft_batched_columns():
    n, cols = 64, 3
    coeffs = RNG.integers(0, P, size=(cols, n), dtype=np.uint64)
    dom = ntt.Domain(n, GENERATOR)
    got = fd.unpack_np(dom.fft_fp(fd.pack_np(coeffs)))
    for c in range(cols):
        assert got[c].tolist() == naive_eval([int(x) for x in coeffs[c]], dom)


def test_fft_bitrev():
    n = 32
    coeffs = [int(x) for x in RNG.integers(0, P, size=n, dtype=np.uint64)]
    dom = ntt.Domain(n, GENERATOR)
    nat = fd.to_ints(dom.fft_fp(fd.pack_np(coeffs)))
    br = fd.to_ints(dom.fft_bitrev_fp(fd.pack_np(coeffs)))
    perm = ntt.bit_reverse_indices(n)
    assert br == [nat[perm[i]] for i in range(n)]


def test_ext3_fft_roundtrip_and_value():
    n = 32
    vals = [Fq3(*[int(x) for x in RNG.integers(0, P, size=3, dtype=np.uint64)]) for _ in range(n)]
    dom = ntt.Domain(n, GENERATOR)
    a = fd.ext3_pack_np(vals)
    evals = dom.fft_ext3(a)
    # value check at a few points: P(x_i)
    got = fd.ext3_unpack_np(evals)
    for i in [0, 1, n // 2, n - 1]:
        x = dom.element(i)
        acc = Fq3.zero()
        for c in reversed(vals):
            acc = acc * x + c
        assert got[i] == acc
    back = fd.ext3_unpack_np(dom.ifft_ext3(evals))
    assert back == vals


def test_powers_table():
    w = 0xABCDEF1234567
    tbl = fd.to_ints(ntt.powers(w, 33))
    assert tbl == [pow(w, i, P) for i in range(33)]


def test_powers_cache_not_populated_inside_trace():
    # powers() embeds cached tables as jit constants, but a call first made
    # INSIDE a trace returns tracers which must never enter the cache.
    import jax

    w, n = 0x1234567, 17
    ntt._POWERS_CACHE.pop((w % P, n), None)

    @jax.jit
    def f():
        return ntt.powers(w, n)

    got = fd.to_ints(f())
    assert (w % P, n) not in ntt._POWERS_CACHE
    assert got == [pow(w, i, P) for i in range(n)]
    # outside a trace the same call populates the cache
    ntt.powers(w, n)
    assert (w % P, n) in ntt._POWERS_CACHE


def test_poly_eval_fp():
    n = 100
    coeffs = [int(x) for x in RNG.integers(0, P, size=n, dtype=np.uint64)]
    z = 987654321987654321 % P
    got = fd.to_ints(ntt.poly_eval_fp(fd.pack_np(coeffs), z))[0]
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % P
    assert got == acc


def test_poly_eval_ext3():
    n = 65
    vals = [Fq3(*[int(x) for x in RNG.integers(0, P, size=3, dtype=np.uint64)]) for _ in range(n)]
    z = Fq3(3, 1, 4)
    a = fd.ext3_pack_np(vals)
    got = fd.ext3_unpack_np(ntt.poly_eval_ext3_at_ext3(a, (z.c0.v, z.c1.v, z.c2.v)))[0]
    acc = Fq3.zero()
    for c in reversed(vals):
        acc = acc * z + c
    assert got == acc


def test_bit_reverse_index():
    assert ntt.bit_reverse_index(8, 1) == 4
    assert ntt.bit_reverse_index(8, 3) == 6
    assert ntt.bit_reverse_index(16, 1) == 8
    perm = ntt.bit_reverse_indices(16)
    assert [perm[i] for i in range(16)] == [ntt.bit_reverse_index(16, i) for i in range(16)]


def test_permute_bitrev_matches_flat_gather():
    """The two-step row-gather factorization (active above _BITREV_FLAT_MAX)
    must equal the flat bit-reverse gather, on every axis and for odd/even
    log n (n1 != n2 splits)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for n in (8, 1 << 13, 1 << 15):  # flat path, odd log, even log
        flat_perm = np.asarray(ntt.bit_reverse_indices(n))
        x = rng.integers(0, 1 << 32, n, np.uint64).astype(np.uint32)
        got = np.asarray(ntt.permute_bitrev(jnp.asarray(x)))
        assert np.array_equal(got, x[flat_perm]), n

        # multi-dim, permuted axis in the middle (the (8, n) digest shape
        # and the (n, 8) RPO leaf shape both reduce to this)
        y = rng.integers(0, 1 << 32, (3, n, 2), np.uint64).astype(np.uint32)
        got = np.asarray(ntt.permute_bitrev(jnp.asarray(y), axis=1))
        assert np.array_equal(got, y[:, flat_perm, :]), n
