"""Host scalar prime fields: Fp252 (StarkWare) and Fp128 (STARK-Anatomy).

Oracle: Python bigint arithmetic mod p (the reference checks its Metal
Montgomery fields against arkworks the same way, gpu/tests/fields.rs)."""

import random

import pytest

from ministark_tpu.fields.fp128 import (
    Fp128,
    GENERATOR128,
    P128,
    TWO_ADIC_ROOT128,
    TWO_ADICITY128,
)
from ministark_tpu.fields.fp252 import (
    Fp252,
    P252,
    TWO_ADIC_ROOT252,
    TWO_ADICITY252,
)


@pytest.mark.parametrize("F,P", [(Fp252, P252), (Fp128, P128)])
def test_field_ops_vs_bigint(F, P):
    rng = random.Random(1)
    for _ in range(50):
        a, b = rng.randrange(P), rng.randrange(1, P)
        assert (F(a) + F(b)).v == (a + b) % P
        assert (F(a) - F(b)).v == (a - b) % P
        assert (F(a) * F(b)).v == (a * b) % P
        assert (-F(a)).v == (-a) % P
        assert ((F(a) / F(b)) * F(b)).v == a % P
        assert F(a).pow(5).v == pow(a, 5, P)


@pytest.mark.parametrize("F,P", [(Fp252, P252), (Fp128, P128)])
def test_serde_roundtrip(F, P):
    x = F(P - 2)
    assert F.from_bytes(x.to_bytes()) == x
    assert len(x.to_bytes()) == F.NUM_BYTES


def test_two_adic_roots():
    # 2^k-th root: order exactly 2^k
    r = TWO_ADIC_ROOT252
    assert pow(r, 1 << TWO_ADICITY252, P252) == 1
    assert pow(r, 1 << (TWO_ADICITY252 - 1), P252) != 1
    r = TWO_ADIC_ROOT128
    assert pow(r, 1 << TWO_ADICITY128, P128) == 1
    assert pow(r, 1 << (TWO_ADICITY128 - 1), P128) != 1
    # the STARK-Anatomy tutorial's published primitive 2^119 root
    assert TWO_ADIC_ROOT128 == 85408008396924667383611388730472331217
    assert P128 == 270497897142230380135924736767050121217  # felt_u128.h.metal:24


def test_fp128_generator_order():
    # p-1 = 2^119 * 11 * 37; generator must miss all proper subgroups
    for q in (2, 11, 37):
        assert pow(GENERATOR128, (P128 - 1) // q, P128) != 1
