"""NTT / evaluation domains over the Goldilocks field, TPU-first.

Replaces the reference's GPU FFT pipeline (gpu/src/plan.rs:378-463 +
gpu/src/metal/fft_shaders.h.metal) with a JAX design:

* ``Domain`` mirrors the semantics of ark ``Radix2EvaluationDomain`` /
  ``new_coset`` (src/air.rs:209-227): ``element(i) = offset * g^i`` with
  ``g = get_root_of_unity(n)``.
* Transforms are radix-2 DIT stages expressed as reshapes + elementwise
  limb arithmetic — no gathers inside the stage loop (a single bit-reversal
  gather happens once per transform).  Under ``jit`` XLA fuses each stage
  into one HBM pass; Pallas kernels in ``ops/`` fuse multiple stages.
* Twiddle/scale tables are computed **on device** with
  ``lax.associative_scan`` over a constant vector (log-depth), then cached
  per (size, root) — the reference computes twiddles on CPU and uploads
  (gpu/src/plan.rs:394-398); on TPU the scan is faster than a host
  round-trip.

Conventions (match ark): ``fft`` maps natural-order coefficients to
natural-order evaluations over the (coset) domain; ``ifft`` is its exact
inverse.  ``fft_bitrev`` returns evaluations in bit-reversed order (the
order the protocol commits to, src/matrix.rs:225-234).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fields import device as fd
from .fields.scalar import Fp, P, get_root_of_unity


# ---------------------------------------------------------------------------
# bit reversal
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def bit_reverse_indices(n: int) -> np.ndarray:
    """Permutation i -> bit_reverse(i) over log2(n) bits (numpy, cached)."""
    assert n & (n - 1) == 0
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros_like(idx)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


def bit_reverse_index(n: int, i: int) -> int:
    log_n = n.bit_length() - 1
    return int(f"{i:0{log_n}b}"[::-1], 2) if log_n > 0 else 0


def bit_reverse_fp(a: fd.Fp2, axis: int = -1) -> fd.Fp2:
    n = a[0].shape[axis]
    perm = jnp.asarray(bit_reverse_indices(n))
    return (jnp.take(a[0], perm, axis=axis), jnp.take(a[1], perm, axis=axis))


def bit_reverse_ext3(a: fd.Ext3, axis: int = -1) -> fd.Ext3:
    return tuple(bit_reverse_fp(c, axis) for c in a)


# ---------------------------------------------------------------------------
# device power tables
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def _powers_device(base: fd.Fp2, n: int) -> fd.Fp2:
    """[1, base, base^2, ..., base^(n-1)] via one associative scan on device."""
    if n == 1:
        return fd.ones((1,))
    lo = jnp.broadcast_to(base[0], (n,))
    hi = jnp.broadcast_to(base[1], (n,))
    lo = lo.at[0].set(1)
    hi = hi.at[0].set(0)
    return jax.lax.associative_scan(lambda x, y: fd.mul(x, y), (lo, hi))


@functools.lru_cache(maxsize=256)
def _powers_cached(base: int, n: int):
    b = (jnp.asarray(np.uint32(base & 0xFFFFFFFF)), jnp.asarray(np.uint32(base >> 32)))
    out = _powers_device(b, n)
    return jax.tree.map(lambda x: jax.block_until_ready(x), out)


def powers(base: int, n: int) -> fd.Fp2:
    """Cached device table of base^i, i < n.

    Inside a jit trace the concrete cached table is embedded as a constant;
    the cache itself is only ever populated outside a trace (populating it
    with tracers would leak them)."""
    from jax._src.core import trace_state_clean

    base %= P
    if not trace_state_clean():
        # compute inline (traced); cheap log-depth scan, no caching
        b = (jnp.asarray(np.uint32(base & 0xFFFFFFFF)), jnp.asarray(np.uint32(base >> 32)))
        return _powers_device(b, n)
    return _powers_cached(base, n)


# ---------------------------------------------------------------------------
# core transform
# ---------------------------------------------------------------------------

def _dit_stages(a: fd.Fp2, tw: fd.Fp2, n: int, mul_tw, add_op, sub_op):
    """Radix-2 DIT butterflies on bit-reversed input -> natural output.

    `a` leaves are shaped (..., n); `tw` is the full table w^0..w^(n/2-1).
    mul_tw(x, tw_slice) multiplies by base-field twiddles.
    """
    log_n = n.bit_length() - 1
    batch = a[0].shape[:-1] if isinstance(a[0], jnp.ndarray) else ()

    def reshape_all(x, shape):
        return jax.tree.map(lambda t: t.reshape(shape), x,
                            is_leaf=lambda t: isinstance(t, jnp.ndarray))

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        stride = n // m
        # twiddle slice w_m^j = W[j * stride], j < half
        tws = (tw[0][::stride][:half], tw[1][::stride][:half])
        x = reshape_all(a, (*batch, n // m, 2, half))
        u = jax.tree.map(lambda t: t[..., 0, :], x,
                         is_leaf=lambda t: isinstance(t, jnp.ndarray))
        v = jax.tree.map(lambda t: t[..., 1, :], x,
                         is_leaf=lambda t: isinstance(t, jnp.ndarray))
        v = mul_tw(v, tws)
        lo_half = add_op(u, v)
        hi_half = sub_op(u, v)
        x = jax.tree.map(lambda p, q: jnp.stack([p, q], axis=-2), lo_half, hi_half)
        a = reshape_all(x, (*batch, n))
    return a


def _fp_mul_tw(v, tws):
    return fd.mul(v, tws)


def _ext3_mul_tw(v, tws):
    return fd.ext3_mul_base(v, tws)


def _ntt_core_fp(a: fd.Fp2, tw: fd.Fp2, n: int) -> fd.Fp2:
    a = bit_reverse_fp(a)
    return _dit_stages(a, tw, n, _fp_mul_tw, fd.add, fd.sub)


def _ntt_core_ext3(a: fd.Ext3, tw: fd.Fp2, n: int) -> fd.Ext3:
    a = bit_reverse_ext3(a)
    return _dit_stages(a, tw, n, _ext3_mul_tw, fd.ext3_add, fd.ext3_sub)


# ---------------------------------------------------------------------------
# evaluation domain
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _jitted_transform(kind: str, size: int, offset: int):
    """Per-(domain, transform) jitted callables, shared across Domain instances."""
    dom = Domain(size, offset)
    # Pre-warm twiddle/scale tables OUTSIDE the trace so they are embedded as
    # constants rather than recomputed inside the compiled transform.
    powers(dom.group_gen, max(size // 2, 1))
    powers(dom.group_gen_inv, max(size // 2, 1))
    if offset != 1:
        powers(dom.offset, size)
        powers(dom.offset_inv, size)
    fn = {
        "fft_fp": dom._fft_fp_impl,
        "ifft_fp": dom._ifft_fp_impl,
        "fft_ext3": dom._fft_ext3_impl,
        "ifft_ext3": dom._ifft_ext3_impl,
    }[kind]
    return jax.jit(fn)


class Domain:
    """Radix-2 (coset) evaluation domain {offset * g^i}, ark-compatible."""

    def __init__(self, size: int, offset: int = 1):
        assert size & (size - 1) == 0 and size > 0
        self.size = size
        self.log_size = size.bit_length() - 1
        self.offset = offset % P
        self.group_gen = get_root_of_unity(size).v if size > 1 else 1
        self.group_gen_inv = pow(self.group_gen, P - 2, P)
        self.offset_inv = pow(self.offset, P - 2, P)
        self.size_inv = pow(size, P - 2, P)

    def element(self, i: int) -> Fp:
        return Fp(self.offset * pow(self.group_gen, i, P))

    def elements_device(self) -> fd.Fp2:
        """offset * g^i for all i, natural order, on device."""
        gpow = powers(self.group_gen, self.size)
        if self.offset == 1:
            return gpow
        return fd.mul(gpow, fd.full(gpow[0].shape, self.offset))

    def get_coset(self, offset: int) -> "Domain":
        return Domain(self.size, offset)

    def offset_pow_size(self) -> int:
        return pow(self.offset, self.size, P)

    # -- transforms: Fp arrays (..., n) -------------------------------------
    # Public entry points dispatch to jitted, cached implementations.

    def fft_fp(self, coeffs: fd.Fp2) -> fd.Fp2:
        """coeffs (natural order) -> evals over the coset, natural order."""
        return _jitted_transform("fft_fp", self.size, self.offset)(coeffs)

    def ifft_fp(self, evals: fd.Fp2) -> fd.Fp2:
        return _jitted_transform("ifft_fp", self.size, self.offset)(evals)

    def fft_bitrev_fp(self, coeffs: fd.Fp2) -> fd.Fp2:
        """Evaluations in bit-reversed order (protocol commitment order)."""
        return bit_reverse_fp(self.fft_fp(coeffs))

    def fft_ext3(self, coeffs: fd.Ext3) -> fd.Ext3:
        return _jitted_transform("fft_ext3", self.size, self.offset)(coeffs)

    def ifft_ext3(self, evals: fd.Ext3) -> fd.Ext3:
        return _jitted_transform("ifft_ext3", self.size, self.offset)(evals)

    def fft_bitrev_ext3(self, coeffs: fd.Ext3) -> fd.Ext3:
        return bit_reverse_ext3(self.fft_ext3(coeffs))

    # -- implementations (traced under jit) ----------------------------------

    def _fft_fp_impl(self, coeffs: fd.Fp2) -> fd.Fp2:
        n = self.size
        coeffs = _zero_pad_fp(coeffs, n)
        if self.offset != 1:
            coeffs = fd.mul(coeffs, self._scale_tbl())
        return _ntt_core_fp(coeffs, powers(self.group_gen, max(n // 2, 1)), n)

    def _ifft_fp_impl(self, evals: fd.Fp2) -> fd.Fp2:
        n = self.size
        out = _ntt_core_fp(evals, powers(self.group_gen_inv, max(n // 2, 1)), n)
        out = fd.mul(out, fd.full(out[0].shape, self.size_inv))
        if self.offset != 1:
            out = fd.mul(out, self._unscale_tbl())
        return out

    def _fft_ext3_impl(self, coeffs: fd.Ext3) -> fd.Ext3:
        n = self.size
        coeffs = tuple(_zero_pad_fp(c, n) for c in coeffs)
        if self.offset != 1:
            coeffs = fd.ext3_mul_base(coeffs, self._scale_tbl())
        return _ntt_core_ext3(coeffs, powers(self.group_gen, max(n // 2, 1)), n)

    def _ifft_ext3_impl(self, evals: fd.Ext3) -> fd.Ext3:
        n = self.size
        out = _ntt_core_ext3(evals, powers(self.group_gen_inv, max(n // 2, 1)), n)
        out = fd.ext3_mul_base(out, fd.full(out[0][0].shape, self.size_inv))
        if self.offset != 1:
            out = fd.ext3_mul_base(out, self._unscale_tbl())
        return out

    # -- internals ----------------------------------------------------------

    def _scale_tbl(self) -> fd.Fp2:
        return powers(self.offset, self.size)

    def _unscale_tbl(self) -> fd.Fp2:
        return powers(self.offset_inv, self.size)


# ---------------------------------------------------------------------------
# polynomial utilities on device
# ---------------------------------------------------------------------------

def _zero_pad_fp(coeffs: fd.Fp2, n: int) -> fd.Fp2:
    """ark fft semantics: shorter coefficient vectors are zero-padded to the
    domain size before the transform."""
    m = coeffs[0].shape[-1]
    if m == n:
        return coeffs
    assert m < n, f"coefficient count {m} exceeds domain size {n}"
    pad = [(0, 0)] * (coeffs[0].ndim - 1) + [(0, n - m)]
    return (jnp.pad(coeffs[0], pad), jnp.pad(coeffs[1], pad))


def poly_eval_fp(coeffs: fd.Fp2, z: int) -> fd.Fp2:
    """Evaluate sum coeffs[i] z^i at scalar z (Horner result, on device).

    Uses a powers table + product-sum; returns a scalar Fp pair."""
    n = coeffs[0].shape[-1]
    zp = powers(z % P, n)
    terms = fd.mul(coeffs, zp)
    return _tree_sum_fp(terms)


def _tree_sum_fp(a: fd.Fp2) -> fd.Fp2:
    """Sum along last axis via halving (log-depth, exact mod p)."""
    n = a[0].shape[-1]
    while n > 1:
        if n % 2 == 1:
            last = (a[0][..., -1:], a[1][..., -1:])
            a = (a[0][..., :-1], a[1][..., :-1])
            n -= 1
            half = n // 2
            s = fd.add((a[0][..., :half], a[1][..., :half]),
                       (a[0][..., half:], a[1][..., half:]))
            s = (jnp.concatenate([s[0], last[0]], -1), jnp.concatenate([s[1], last[1]], -1))
            a = s
            n = half + 1
        else:
            half = n // 2
            a = fd.add((a[0][..., :half], a[1][..., :half]),
                       (a[0][..., half:], a[1][..., half:]))
            n = half
    return (a[0][..., 0], a[1][..., 0])


def _tree_sum_ext3(a: fd.Ext3) -> fd.Ext3:
    return tuple(_tree_sum_fp(c) for c in a)


def poly_eval_ext3_at_ext3(coeffs: fd.Ext3, z) -> fd.Ext3:
    """Evaluate an Fq3-coefficient polynomial at an Fq3 scalar z on device.

    z powers are built with an associative scan in the extension field."""
    n = coeffs[0][0].shape[-1]
    zc = tuple(fd.full((n,), c) for c in z)  # broadcast z to length n
    # turn position 0 into one
    zc = (
        (zc[0][0].at[0].set(1), zc[0][1].at[0].set(0)),
        (zc[1][0].at[0].set(0), zc[1][1].at[0].set(0)),
        (zc[2][0].at[0].set(0), zc[2][1].at[0].set(0)),
    )
    zp = jax.lax.associative_scan(lambda x, y: fd.ext3_mul(tuple(x), tuple(y)), zc)
    terms = fd.ext3_mul(coeffs, tuple(zp))
    return _tree_sum_ext3(terms)


def poly_eval_fp_at_ext3(coeffs: fd.Fp2, z) -> fd.Ext3:
    """Evaluate an Fp-coefficient polynomial at an Fq3 point."""
    return poly_eval_ext3_at_ext3(fd.ext3_from_base(coeffs), z)
