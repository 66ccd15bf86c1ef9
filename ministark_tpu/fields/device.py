"""Device-side (vectorized) Goldilocks arithmetic on uint32 limb pairs.

A field-element array is represented as a pair ``(lo, hi)`` of equal-shape
``uint32`` jax arrays holding the canonical value ``lo + hi * 2^32`` in
``[0, p)``.  All ops here are pure ``jnp`` uint32 arithmetic so they work both
in plain jitted JAX code *and inside Pallas TPU kernels* (which have no 64-bit
integer support).  This mirrors the role of the reference's Metal field header
(gpu/src/metal/felt_u64.h.metal) but uses a canonical (non-Montgomery)
representation: all serialization in the protocol is canonical LE bytes
(src/hash.rs:92-100) so Montgomery form would only add conversions.

The 64x64->128 multiply uses 16-bit limb splitting (products of 16-bit halves
fit exactly in uint32), and reduction uses the Goldilocks identities
2^64 = 2^32 - 1 and 2^96 = -1 (mod p), the same reduction the reference's
Metal kernel implements (felt_u64.h.metal:165-177).

An extension-field (Fq3) element is a tuple of three Fp pairs; see `ext3_*`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .scalar import P, FQ3_NONRESIDUE

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)
P_LO = np.uint32(0x00000001)
P_HI = np.uint32(0xFFFFFFFF)
# 2^32 - 1 == 2^64 mod p
EPS = np.uint32(0xFFFFFFFF)

Fp2 = tuple  # (lo, hi) pair of uint32 arrays


def _u32(x):
    return x.astype(U32) if hasattr(x, "astype") else jnp.asarray(x, U32)


# ---------------------------------------------------------------------------
# host <-> device conversion helpers (numpy)
# ---------------------------------------------------------------------------

def pack_np(values) -> tuple[np.ndarray, np.ndarray]:
    """Python ints / uint64 numpy -> (lo, hi) uint32 numpy arrays."""
    a = np.asarray(values, dtype=np.uint64)
    lo = (a & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (a >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def unpack_np(fp: Fp2) -> np.ndarray:
    lo = np.asarray(fp[0], dtype=np.uint64)
    hi = np.asarray(fp[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def to_ints(fp: Fp2) -> list[int]:
    return [int(v) for v in unpack_np(fp).ravel()]


# ---------------------------------------------------------------------------
# u64-on-u32-pairs primitives
# ---------------------------------------------------------------------------

def _add32c(a, b):
    """uint32 add with carry-out (0/1)."""
    s = a + b
    return s, (s < a).astype(U32)


def _sub32b(a, b):
    """uint32 sub with borrow-out (0/1)."""
    d = a - b
    return d, (a < b).astype(U32)


def add64(a: Fp2, b: Fp2):
    """(lo,hi)+(lo,hi) -> (lo,hi), carry."""
    lo, c = _add32c(a[0], b[0])
    hi1, c1 = _add32c(a[1], b[1])
    hi, c2 = _add32c(hi1, c)
    return (lo, hi), c1 | c2


def sub64(a: Fp2, b: Fp2):
    """(lo,hi)-(lo,hi) -> (lo,hi), borrow."""
    lo, br = _sub32b(a[0], b[0])
    hi1, b1 = _sub32b(a[1], b[1])
    hi, b2 = _sub32b(hi1, br)
    return (lo, hi), b1 | b2


def geq64(a: Fp2, b: Fp2):
    return (a[1] > b[1]) | ((a[1] == b[1]) & (a[0] >= b[0]))


def eq64(a: Fp2, b: Fp2):
    return (a[0] == b[0]) & (a[1] == b[1])


def mul32_wide(a, b):
    """32x32 -> 64-bit product as (lo, hi) uint32, via 16-bit halves.

    The low word comes from the native wrapping u32 multiply (one VPU op);
    only the carry of ll + (mid << 16) must be reconstructed: with
    t = mid << 16, the wrapped sum lo = ll + t carried iff lo < t."""
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid, cm = _add32c(lh, hl)  # <= 2^33 - ..., carry tracked
    lo = a * b
    cl = (lo < (mid << 16)).astype(U32)
    hi = hh + (mid >> 16) + (cm << 16) + cl
    return lo, hi


def mul64_wide(a: Fp2, b: Fp2):
    """64x64 -> 128-bit product as 4 uint32 limbs (r0..r3, little-endian)."""
    a0, a1 = a
    b0, b1 = b
    p00l, p00h = mul32_wide(a0, b0)
    p01l, p01h = mul32_wide(a0, b1)
    p10l, p10h = mul32_wide(a1, b0)
    p11l, p11h = mul32_wide(a1, b1)

    r0 = p00l
    # r1 = p00h + p01l + p10l
    r1, c1a = _add32c(p00h, p01l)
    r1, c1b = _add32c(r1, p10l)
    # r2 = p01h + p10h + p11l + carries
    r2, c2a = _add32c(p01h, p10h)
    r2, c2b = _add32c(r2, p11l)
    r2, c2c = _add32c(r2, c1a + c1b)
    r3 = p11h + c2a + c2b + c2c
    return r0, r1, r2, r3


def reduce128(r0, r1, r2, r3) -> Fp2:
    """Reduce a 128-bit value (4 u32 limbs) mod p, canonical output.

    x = n0 + 2^64*n1_lo + 2^96*n1_hi  ==  n0 + (2^32-1)*n1_lo - n1_hi  (mod p)
    """
    n0 = (r0, r1)
    n1_lo = r2
    n1_hi = r3

    # t = n0 - n1_hi  (if borrow, subtract 2^32-1 again, i.e. + p mod 2^64)
    t, br = sub64(n0, (n1_hi, jnp.zeros_like(n1_hi)))
    t, _ = sub64(t, (br * EPS, jnp.zeros_like(br)))

    # u = n1_lo * (2^32 - 1) = (n1_lo << 32) - n1_lo
    u_lo, ub = _sub32b(jnp.zeros_like(n1_lo), n1_lo)
    u_hi = n1_lo - ub
    u = (u_lo, u_hi)

    res, c = add64(t, u)
    # carry means +2^64 == +(2^32-1) mod p; cannot re-carry (see module docs)
    res, _ = add64(res, (c * EPS, jnp.zeros_like(c)))
    return canonicalize(res)


def canonicalize(a: Fp2) -> Fp2:
    """Map a mod-2^64 representative (< 2^64) into [0, p). One subtract is
    enough since 2p > 2^64."""
    pfull = (jnp.full_like(a[0], P_LO), jnp.full_like(a[1], P_HI))
    d, _ = sub64(a, pfull)
    g = geq64(a, pfull)
    return (jnp.where(g, d[0], a[0]), jnp.where(g, d[1], a[1]))


# ---------------------------------------------------------------------------
# field ops (inputs/outputs canonical)
# ---------------------------------------------------------------------------

def zeros(shape=()) -> Fp2:
    return jnp.zeros(shape, U32), jnp.zeros(shape, U32)


def ones(shape=()) -> Fp2:
    return jnp.ones(shape, U32), jnp.zeros(shape, U32)


def full(shape, value: int) -> Fp2:
    value %= P
    return (
        jnp.full(shape, np.uint32(value & 0xFFFFFFFF), U32),
        jnp.full(shape, np.uint32(value >> 32), U32),
    )


def add(a: Fp2, b: Fp2) -> Fp2:
    s, c = add64(a, b)
    pfull = (jnp.full_like(s[0], P_LO), jnp.full_like(s[1], P_HI))
    # carry: wrapped value +2^64 => add 2^32-1 (cannot exceed p afterwards)
    s_c, _ = add64(s, (jnp.full_like(s[0], EPS), jnp.zeros_like(s[1])))
    # no carry: conditional subtract
    d, _ = sub64(s, pfull)
    g = geq64(s, pfull)
    s_n = (jnp.where(g, d[0], s[0]), jnp.where(g, d[1], s[1]))
    cb = c.astype(bool)
    return (jnp.where(cb, s_c[0], s_n[0]), jnp.where(cb, s_c[1], s_n[1]))


def sub(a: Fp2, b: Fp2) -> Fp2:
    d, br = sub64(a, b)
    # borrow: wrapped value -2^64 => subtract another 2^32-1 (== +p)
    d2, _ = sub64(d, (jnp.full_like(d[0], EPS), jnp.zeros_like(d[1])))
    bb = br.astype(bool)
    return (jnp.where(bb, d2[0], d[0]), jnp.where(bb, d2[1], d[1]))


def neg(a: Fp2) -> Fp2:
    pfull = (jnp.full_like(a[0], P_LO), jnp.full_like(a[1], P_HI))
    d, _ = sub64(pfull, a)
    z = (a[0] == 0) & (a[1] == 0)
    return (jnp.where(z, a[0], d[0]), jnp.where(z, a[1], d[1]))


def mul(a: Fp2, b: Fp2) -> Fp2:
    return reduce128(*mul64_wide(a, b))


# ---------------------------------------------------------------------------
# lazy ops: values are mod-p REPRESENTATIVES in [0, 2^64), not canonical.
# Hot kernels (ops/ntt_pallas.py) chain these across butterfly stages and
# canonicalize once on the way out — saving the compare+select canonical
# reduction per op (~20% of the butterfly's VPU work).
# ---------------------------------------------------------------------------

def add_lazy(a: Fp2, b: Fp2) -> Fp2:
    """a + b mod p as a u64 representative (inputs: any u64 representatives).

    A carry means +2^64 == +EPS (mod p).  The EPS fold can itself carry
    (wrapped sum s <= 2^64-2, so s+EPS wraps when s >= 2^64-EPS); when it
    does, the re-wrapped value is < EPS so folding EPS once more cannot
    carry a third time."""
    s, c = add64(a, b)
    s2, c2 = add64(s, (c * EPS, jnp.zeros_like(c)))
    s3, _ = add64(s2, (c2 * EPS, jnp.zeros_like(c2)))
    return s3


def sub_lazy(a: Fp2, b: Fp2) -> Fp2:
    """a - b mod p as a u64 representative.

    A borrow means -2^64 == -EPS (mod p); the first correction can re-borrow
    only when the wrapped difference was < EPS, in which case the second
    correction's operand is >= 2^64 - EPS and cannot borrow again."""
    d, br = sub64(a, b)
    d2, br2 = sub64(d, (br * EPS, jnp.zeros_like(br)))
    d3, _ = sub64(d2, (br2 * EPS, jnp.zeros_like(br2)))
    return d3


def reduce128_lazy(r0, r1, r2, r3) -> Fp2:
    """reduce128 without the final canonical fold: output in [0, 2^64)."""
    n0 = (r0, r1)
    n1_lo = r2
    n1_hi = r3
    t, br = sub64(n0, (n1_hi, jnp.zeros_like(n1_hi)))
    t, _ = sub64(t, (br * EPS, jnp.zeros_like(br)))
    u_lo, ub = _sub32b(jnp.zeros_like(n1_lo), n1_lo)
    u_hi = n1_lo - ub
    res, c = add64(t, (u_lo, u_hi))
    res, _ = add64(res, (c * EPS, jnp.zeros_like(c)))
    return res


def mul_lazy(a: Fp2, b: Fp2) -> Fp2:
    """a * b mod p as a u64 representative (inputs: any u64 representatives)."""
    return reduce128_lazy(*mul64_wide(a, b))


def sqr(a: Fp2) -> Fp2:
    return mul(a, a)


def mul_const(a: Fp2, c: int) -> Fp2:
    return mul(a, full(jnp.shape(a[0]), c))


def add_const(a: Fp2, c: int) -> Fp2:
    return add(a, full(jnp.shape(a[0]), c))


@functools.partial(jax.jit, static_argnums=(1,))
def pow_const(a: Fp2, e: int) -> Fp2:
    """a^e with a static (Python int) exponent, binary ladder."""
    assert e >= 0
    if e == 0:
        return ones(jnp.shape(a[0]))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = sqr(base)
    return result


def inv(a: Fp2) -> Fp2:
    """Elementwise inverse via Fermat (a^(p-2)). Prefer `batch_inv` for arrays."""
    return pow_const(a, P - 2)


def _host_inv_np(lo, hi):
    vals = np.asarray(lo, np.uint64) | (np.asarray(hi, np.uint64) << np.uint64(32))
    out = np.empty(vals.shape, np.uint64)
    flat_in = vals.ravel()
    flat_out = out.ravel()
    for i in range(flat_in.size):
        v = int(flat_in[i])
        flat_out[i] = pow(v, P - 2, P) if v else 0
    return ((out & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (out >> np.uint64(32)).astype(np.uint32))


def inv_via_host(a: Fp2) -> Fp2:
    """Inverse of a SMALL array.

    On the CPU backend: a host callback — the Fermat chain is ~100 field
    muls -> a ~25k-HLO graph that XLA:CPU compiles for half a minute.
    On TPU: the axon PJRT has no host-callback support, and the TPU compiler
    handles the chain fine — use Fermat."""
    if jax.default_backend() != "cpu":
        return pow_const(a, P - 2)
    shape = jnp.shape(a[0])
    result_shape = (jax.ShapeDtypeStruct(shape, U32), jax.ShapeDtypeStruct(shape, U32))
    return tuple(jax.pure_callback(_host_inv_np, result_shape, a[0], a[1]))


def select(mask, a: Fp2, b: Fp2) -> Fp2:
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


def is_zero(a: Fp2):
    return (a[0] == 0) & (a[1] == 0)


def _shifted_prefix_products(a: Fp2, axis: int):
    """Hillis-Steele prefix products: log2(n) shift-multiply passes.

    Chosen over lax.associative_scan because its unrolled lowering is tiny
    (one field-mul + one pad per level) — XLA compile time is superlinear in
    graph size and our field ops are ~10^2 HLO each.  Returns EXCLUSIVE
    prefix products (ones at position 0).

    Every level is fenced with an optimization_barrier: without it XLA fuses
    the whole doubling chain into downstream elementwise consumers and
    recomputes it PER OUTPUT ELEMENT — each level reads two shifted copies of
    the previous one, so fused cost is O(2^levels) per element (measured:
    a 4096-point batch_inv went from 9 ms to 134 s on XLA:CPU)."""
    n = a[0].shape[axis]

    def shift_right(x, k):
        lo, hi = x
        ol = jnp.ones_like(jax.lax.slice_in_dim(lo, 0, k, axis=axis))
        oh = jnp.zeros_like(ol)
        lo = jnp.concatenate([ol, jax.lax.slice_in_dim(lo, 0, n - k, axis=axis)], axis=axis)
        hi = jnp.concatenate([oh, jax.lax.slice_in_dim(hi, 0, n - k, axis=axis)], axis=axis)
        return lo, hi

    pref = shift_right(a, 1)  # exclusive
    k = 1
    while k < n:
        pref = jax.lax.optimization_barrier(mul(pref, shift_right(pref, k)))
        k *= 2
    return pref


def _shifted_suffix_products(a: Fp2, axis: int):
    """Exclusive suffix products (ones at the last position)."""
    n = a[0].shape[axis]

    def shift_left(x, k):
        lo, hi = x
        ol = jnp.ones_like(jax.lax.slice_in_dim(lo, 0, k, axis=axis))
        oh = jnp.zeros_like(ol)
        lo = jnp.concatenate([jax.lax.slice_in_dim(lo, k, n, axis=axis), ol], axis=axis)
        hi = jnp.concatenate([jax.lax.slice_in_dim(hi, k, n, axis=axis), oh], axis=axis)
        return lo, hi

    suff = shift_left(a, 1)
    k = 1
    while k < n:
        suff = jax.lax.optimization_barrier(mul(suff, shift_left(suff, k)))
        k *= 2
    return suff


def _pallas_inv_mode(shape):
    """'run' / 'interpret' / None — use the one-pass Pallas Fermat inverse
    when off-CPU (or under the test env flag) and the size tiles cleanly."""
    import os

    from ..ops import inv_pallas

    if not inv_pallas.eligible(shape):
        return None
    from .. import runtime
    if runtime.spmd():
        return None
    if jax.default_backend() != "cpu":
        return "run"
    if os.environ.get("MINISTARK_TPU_FUSED_INV") == "interpret":
        return "interpret"
    return None


def _host_batch_inv_np(lo, hi):
    """Whole-array inverse on the host: vectorized numpy Fermat chain
    (npfield.inv), 0 -> 0."""
    from . import npfield

    return npfield.to_limbs(npfield.inv(npfield.from_limbs(lo, hi)))


def _batch_inv_host(a: Fp2) -> Fp2:
    shape = jnp.shape(a[0])
    result_shape = (jax.ShapeDtypeStruct(shape, U32),
                    jax.ShapeDtypeStruct(shape, U32))
    return tuple(jax.pure_callback(_host_batch_inv_np, result_shape,
                                   a[0], a[1]))


def batch_inv(a: Fp2, axis: int = -1) -> Fp2:
    mode = _pallas_inv_mode(jnp.shape(a[0]))
    if mode is not None:
        from ..ops.inv_pallas import inv_fp_pallas

        return inv_fp_pallas(a, interpret=mode == "interpret")
    if jax.default_backend() == "cpu":
        # XLA:CPU drops optimization_barrier and re-fuses the Hillis-Steele
        # doubling chains of _batch_inv_scan into their consumers, turning
        # O(n log n) into O(n * 2^levels) (a 4096-pt inverse measured 134 s).
        # The test backend instead inverts on the host (numpy Fermat chain).
        return _batch_inv_host(a)
    return _batch_inv_scan(a, axis)


@functools.partial(jax.jit, static_argnums=(1,))
def _batch_inv_scan(a: Fp2, axis: int = -1) -> Fp2:
    """Batched inversion (Montgomery trick):
    inv(a[i]) = prefix(i-1) * suffix(i+1) * inv(total).
    All inputs must be nonzero; the single total inverse goes to the host."""
    axis = axis % a[0].ndim
    pref_excl = _shifted_prefix_products(a, axis)
    suff_excl = _shifted_suffix_products(a, axis)
    n = a[0].shape[axis]
    last_pref = (jnp.take(pref_excl[0], n - 1, axis=axis),
                 jnp.take(pref_excl[1], n - 1, axis=axis))
    last_a = (jnp.take(a[0], n - 1, axis=axis), jnp.take(a[1], n - 1, axis=axis))
    total = mul(last_pref, last_a)
    tinv = inv_via_host(total)
    tinv_b = (
        jnp.broadcast_to(jnp.expand_dims(tinv[0], axis), a[0].shape),
        jnp.broadcast_to(jnp.expand_dims(tinv[1], axis), a[1].shape),
    )
    return mul(mul(pref_excl, suff_excl), tinv_b)


# ---------------------------------------------------------------------------
# Fq3 = Fp[u]/(u^3 - 2): element is a tuple (c0, c1, c2) of Fp pairs
# ---------------------------------------------------------------------------

Ext3 = tuple  # (Fp2, Fp2, Fp2)

NR = FQ3_NONRESIDUE


def ext3_zeros(shape=()) -> Ext3:
    return (zeros(shape), zeros(shape), zeros(shape))


def ext3_from_base(a: Fp2) -> Ext3:
    return (a, zeros(jnp.shape(a[0])), zeros(jnp.shape(a[0])))


def ext3_full(shape, c0: int, c1: int, c2: int) -> Ext3:
    return (full(shape, c0), full(shape, c1), full(shape, c2))


def ext3_add(a: Ext3, b: Ext3) -> Ext3:
    return tuple(add(x, y) for x, y in zip(a, b))


def ext3_sub(a: Ext3, b: Ext3) -> Ext3:
    return tuple(sub(x, y) for x, y in zip(a, b))


def ext3_neg(a: Ext3) -> Ext3:
    return tuple(neg(x) for x in a)


def ext3_mul(a: Ext3, b: Ext3) -> Ext3:
    a0, a1, a2 = a
    b0, b1, b2 = b
    # u^3 = 2: schoolbook with nonresidue folding
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
    c2 = add(add(t02, t11), t20)
    return (c0, c1, c2)


def ext3_mul_base(a: Ext3, b: Fp2) -> Ext3:
    return tuple(mul(x, b) for x in a)


def ext3_sqr(a: Ext3) -> Ext3:
    return ext3_mul(a, a)


@functools.partial(jax.jit, static_argnums=(1,))
def ext3_pow_const(a: Ext3, e: int) -> Ext3:
    assert e >= 0
    if e == 0:
        return ext3_full(jnp.shape(a[0][0]), 1, 0, 0)
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else ext3_mul(result, base)
        e >>= 1
        if e:
            base = ext3_sqr(base)
    return result


def ext3_inv(a: Ext3, host_scalar_inv: bool = False) -> Ext3:
    """Cubic-extension inverse (see fields.scalar.Fq3.inverse)."""
    c0, c1, c2 = a
    v0 = sub(sqr(c0), mul_const(mul(c1, c2), NR))
    v1 = sub(mul_const(sqr(c2), NR), mul(c0, c1))
    v2 = sub(sqr(c1), mul(c0, c2))
    norm = add(mul(c0, v0), mul_const(add(mul(c2, v1), mul(c1, v2)), NR))
    ninv = inv_via_host(norm) if host_scalar_inv else inv(norm)
    return (mul(v0, ninv), mul(v1, ninv), mul(v2, ninv))


def ext3_batch_inv(a: Ext3, axis: int = -1) -> Ext3:
    mode = _pallas_inv_mode(jnp.shape(a[0][0]))
    if mode is not None:
        from ..ops.inv_pallas import inv_ext3_pallas

        return inv_ext3_pallas(a, interpret=mode == "interpret")
    return _ext3_batch_inv_scan(a, axis)


@functools.partial(jax.jit, static_argnums=(1,))
def _ext3_batch_inv_scan(a: Ext3, axis: int = -1) -> Ext3:
    """Batched Fq3 inversion via the norm map: for w = a + b*u + c*u^2 with
    u^3 = 2,  1/w = (v0 + v1*u + v2*u^2) / N(w)  where

        v0 = a^2 - 2bc,  v1 = 2c^2 - ab,  v2 = b^2 - ac,
        N  = a*v0 + 2*(c*v1 + b*v2)   (N lies in the BASE field)

    so one elementwise pass + a base-field batched inversion does the whole
    job — no extension-field scans."""
    axis = axis % a[0][0].ndim
    c0, c1, c2 = a
    v0 = sub(sqr(c0), mul_const(mul(c1, c2), NR))
    v1 = sub(mul_const(sqr(c2), NR), mul(c0, c1))
    v2 = sub(sqr(c1), mul(c0, c2))
    norm = add(mul(c0, v0), mul_const(add(mul(c2, v1), mul(c1, v2)), NR))
    ninv = batch_inv(norm, axis)
    return (mul(v0, ninv), mul(v1, ninv), mul(v2, ninv))


def ext3_select(mask, a: Ext3, b: Ext3) -> Ext3:
    return tuple(select(mask, x, y) for x, y in zip(a, b))


# ---------------------------------------------------------------------------
# host conversions for Ext3
# ---------------------------------------------------------------------------

def ext3_pack_np(values) -> tuple:
    """Iterable of scalar.Fq3 -> Ext3 numpy limb arrays."""
    c0 = pack_np([v.c0.v for v in values])
    c1 = pack_np([v.c1.v for v in values])
    c2 = pack_np([v.c2.v for v in values])
    return (c0, c1, c2)


def ext3_unpack_np(a: Ext3):
    from .scalar import Fq3

    c0 = unpack_np(a[0]).ravel()
    c1 = unpack_np(a[1]).ravel()
    c2 = unpack_np(a[2]).ravel()
    return [Fq3(int(x), int(y), int(z)) for x, y, z in zip(c0, c1, c2)]
