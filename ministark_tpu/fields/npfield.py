"""Goldilocks field (and its cubic extension) on numpy uint64 arrays.

This is the rebuild's analogue of the reference's CPU evaluation path
(src/eval_cpu.rs): eager, C-speed vector arithmetic with NO tracing or
compilation — the right backend for small problem sizes and for the test
suite, where JAX's per-op tracing overhead (~0.3ms/op on one core) dwarfs
the arithmetic.

Representation: canonical np.uint64 values (< p).  numpy has native 64-bit
integers, so unlike the TPU limb encoding (fields/device.py) a field element
is ONE array; 128-bit products are assembled from 32-bit halves with uint64
intermediates.  Same value-level semantics as fields/device.py and
fields/scalar.py — cross-checked in tests/test_fields.py.
"""

from __future__ import annotations

import numpy as np

from .scalar import P

U64 = np.uint64
_P = U64(P)
_MASK32 = U64(0xFFFFFFFF)
_EPS = U64(0xFFFFFFFF)  # 2^64 mod p = 2^32 - 1
NR = 2  # Fq3 non-residue: u^3 = 2


def asarray(v) -> np.ndarray:
    return np.asarray(v, dtype=U64)


def from_limbs(lo, hi) -> np.ndarray:
    """(lo, hi) uint32 limb arrays (possibly jax) -> u64 numpy values."""
    return (np.asarray(lo, dtype=U64)
            | (np.asarray(hi, dtype=U64) << U64(32)))


def to_limbs(a) -> tuple[np.ndarray, np.ndarray]:
    a = asarray(a)
    return ((a & _MASK32).astype(np.uint32),
            (a >> U64(32)).astype(np.uint32))


def add(a, b):
    """Mod-p addition of canonical values: on u64 wrap-around add
    eps = 2^64 mod p (the wrapped branch is provably < p already)."""
    with np.errstate(over="ignore"):
        s = a + b
        wrapped = s < a
        s = s + wrapped.astype(U64) * _EPS
        return np.where(s >= _P, s - _P, s)


def sub(a, b):
    with np.errstate(over="ignore"):
        d = a - b
        borrow = a < b
        d = d - borrow.astype(U64) * _EPS
        return np.where(d >= _P, d - _P, d)


def neg(a):
    return np.where(a == 0, a, _P - a)


def _mul_wide(a, b):
    """Full 128-bit product of u64 arrays -> (hi, lo) u64 pair."""
    with np.errstate(over="ignore"):
        a_lo = a & _MASK32
        a_hi = a >> U64(32)
        b_lo = b & _MASK32
        b_hi = b >> U64(32)
        ll = a_lo * b_lo
        lh = a_lo * b_hi
        hl = a_hi * b_lo
        hh = a_hi * b_hi
        mid = (ll >> U64(32)) + (lh & _MASK32) + (hl & _MASK32)
        lo = (ll & _MASK32) | (mid << U64(32))
        hi = hh + (lh >> U64(32)) + (hl >> U64(32)) + (mid >> U64(32))
    return hi, lo


def mul(a, b):
    """Goldilocks reduction of the 128-bit product (same algebra as
    fields/device.py reduce128: hi*2^64 ≡ hi_hi*(2^32-1)... folded)."""
    hi, lo = _mul_wide(a, b)
    with np.errstate(over="ignore"):
        hi_hi = hi >> U64(32)
        hi_lo = hi & _MASK32
        # t = lo - hi_hi  (2^96 ≡ -1 mod p); on borrow the u64 wrap adds
        # 2^64 ≡ eps, so subtract eps to land on lo - hi_hi + p
        borrow = lo < hi_hi
        t = lo - hi_hi
        t = t - borrow.astype(U64) * _EPS
        # add hi_lo * eps  (2^64 ≡ eps mod p)
        m = hi_lo * _EPS  # < 2^32 * 2^32 = 2^64, no overflow
        s = t + m
        wrapped = s < t
        s = s + wrapped.astype(U64) * _EPS
        return np.where(s >= _P, s - _P, s)


def sqr(a):
    return mul(a, a)


def mul_const(a, c: int):
    return mul(a, U64(c % P))


def pow_const(a, e: int):
    assert e >= 0
    if e == 0:
        return np.ones_like(asarray(a))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def inv(a):
    """Elementwise Fermat inverse a^(p-2)."""
    return pow_const(a, P - 2)


batch_inv = inv


def full(shape, value: int):
    return np.full(shape, U64(value % P), dtype=U64)


# -- cubic extension Fq3 = Fp[u]/(u^3 - 2) -----------------------------------

def ext3_from_base(a):
    z = np.zeros_like(a)
    return (a, z, z.copy())


def ext3_full(shape, c0: int, c1: int, c2: int):
    return (full(shape, c0), full(shape, c1), full(shape, c2))


def ext3_add(a, b):
    return tuple(add(x, y) for x, y in zip(a, b))


def ext3_sub(a, b):
    return tuple(sub(x, y) for x, y in zip(a, b))


def ext3_neg(a):
    return tuple(neg(x) for x in a)


def ext3_mul(a, b):
    """Schoolbook with u^3 = 2 folding (same result as device Karatsuba)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    t00 = mul(a0, b0)
    t01 = mul(a0, b1)
    t02 = mul(a0, b2)
    t10 = mul(a1, b0)
    t11 = mul(a1, b1)
    t12 = mul(a1, b2)
    t20 = mul(a2, b0)
    t21 = mul(a2, b1)
    t22 = mul(a2, b2)
    c0 = add(t00, mul_const(add(t12, t21), NR))
    c1 = add(add(t01, t10), mul_const(t22, NR))
    c2 = add(add(t02, t20), t11)
    return (c0, c1, c2)


def ext3_sqr(a):
    return ext3_mul(a, a)


def ext3_pow_const(a, e: int):
    assert e >= 0
    if e == 0:
        return ext3_full(np.shape(a[0]), 1, 0, 0)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else ext3_mul(result, base)
        e >>= 1
        if e:
            base = ext3_sqr(base)
    return result


def ext3_inv(a):
    """Norm-map inverse (see fields/device.py ext3_batch_inv docstring)."""
    c0, c1, c2 = a
    v0 = sub(sqr(c0), mul_const(mul(c1, c2), NR))
    v1 = sub(mul_const(sqr(c2), NR), mul(c0, c1))
    v2 = sub(sqr(c1), mul(c0, c2))
    norm = add(mul(c0, v0), mul_const(add(mul(c2, v1), mul(c1, v2)), NR))
    ninv = inv(norm)
    return (mul(v0, ninv), mul(v1, ninv), mul(v2, ninv))


ext3_batch_inv = ext3_inv
