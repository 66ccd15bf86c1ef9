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


# A flat n-element gather on TPU runs at ~0.12 Gelem/s at LDE scale; the
# two-row-gather factorization below runs at ~2.1 (17x, benches/bitrev.py).
# Below this size the extra reshuffles aren't worth the bookkeeping.
_BITREV_FLAT_MAX = 1 << 12


def permute_bitrev(t, axis: int = -1):
    """Bit-reverse permutation of `t` along `axis`.

    Large axes use the factorization bitrev_n(c*n1 + d) = bitrev_n1(d)*n2 +
    bitrev_n2(c): reshape the axis to (n1, n2), gather ROWS by bitrev_n1,
    swap the two axes, gather rows by bitrev_n2 — whole contiguous rows move
    instead of single elements, which is 17x faster than one flat n-element
    gather on TPU (benches/bitrev.py)."""
    n = t.shape[axis]
    if n <= _BITREV_FLAT_MAX:
        return jnp.take(t, jnp.asarray(bit_reverse_indices(n)), axis=axis)
    n1, n2 = _split_n(n)
    ax = axis % t.ndim
    lead, trail = t.shape[:ax], t.shape[ax + 1:]
    y = t.reshape(*lead, n1, n2, *trail)
    y = jnp.take(y, jnp.asarray(bit_reverse_indices(n1)), axis=ax)
    y = jnp.swapaxes(y, ax, ax + 1)
    y = jnp.take(y, jnp.asarray(bit_reverse_indices(n2)), axis=ax)
    return y.reshape(*lead, n, *trail)


def bit_reverse_fp(a: fd.Fp2, axis: int = -1) -> fd.Fp2:
    return (permute_bitrev(a[0], axis), permute_bitrev(a[1], axis))


def bit_reverse_ext3(a: fd.Ext3, axis: int = -1) -> fd.Ext3:
    return tuple(bit_reverse_fp(c, axis) for c in a)


# ---------------------------------------------------------------------------
# device power tables
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1,))
def _powers_device(base: fd.Fp2, n: int) -> fd.Fp2:
    """[1, base, base^2, ..., base^(n-1)] by log-doubling: p_{2k} is built
    from p_k by one vector multiply with base^k (log2(n) field muls total —
    a tiny graph, unlike a scan lowering)."""
    if n == 1:
        return fd.ones((1,))
    out = (jnp.ones((1,), fd.U32), jnp.zeros((1,), fd.U32))  # [1]
    step = base  # base^(2^k)
    k = 1
    while k < n:
        take = min(k, n - k)
        chunk = (out[0][:take], out[1][:take])
        stepb = (jnp.broadcast_to(step[0], (take,)), jnp.broadcast_to(step[1], (take,)))
        nxt = fd.mul(chunk, stepb)
        # barrier: keep XLA from fusing the doubling chain into consumers
        # (exponential per-element recompute; see fields/device.py scans)
        out = jax.lax.optimization_barrier(
            (jnp.concatenate([out[0], nxt[0]]), jnp.concatenate([out[1], nxt[1]])))
        if 2 * k < n:
            step = fd.mul(step, step)
        k *= 2
    return out


try:  # stable across jax versions; jax.core re-exports with a deprecation shim
    from jax.core import Tracer as _Tracer
except ImportError:  # pragma: no cover
    from jax._src.core import Tracer as _Tracer

_POWERS_CACHE: dict = {}
_ELEMENTS_CACHE: dict = {}
_POWERS_CACHE_MAX = 256


def powers(base: int, n: int) -> fd.Fp2:
    """Cached device table of base^i, i < n.

    Inside a jit trace the concrete cached table is embedded as a constant;
    the cache must only be populated outside a trace (a jit-inside-jit call
    returns tracers even for concrete int args, and caching those would
    leak them).  Rather than querying jax's private trace-state API, probe
    the result: only concrete outputs are cached."""
    base %= P
    key = (base, n)
    hit = _POWERS_CACHE.get(key)
    if hit is not None:
        return hit
    b = (jnp.asarray(np.uint32(base & 0xFFFFFFFF)), jnp.asarray(np.uint32(base >> 32)))
    out = _powers_device(b, n)
    if isinstance(out[0], _Tracer):
        return out  # traced inline inside an outer jit; not cacheable
    out = jax.tree.map(jax.block_until_ready, out)
    if len(_POWERS_CACHE) >= _POWERS_CACHE_MAX:
        _POWERS_CACHE.pop(next(iter(_POWERS_CACHE)))
    _POWERS_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# core transform
# ---------------------------------------------------------------------------
#
# TPU layout rule: the trailing (lane) dimension must stay wide.  A flat
# radix-2 pass views the array as (n/m, 2, m/2) whose trailing dim collapses
# to 1 in early stages — every such stage relayouts the whole array (measured
# ~100ms/stage at 2^20 on v5e).  So:
#   * small transforms run stages along axis 0 with the BATCH TRAILING;
#   * large transforms use the six-step decomposition n = n1*n2:
#     column-NTT (axis 0, n2 trailing) -> twiddle -> transpose ->
#     column-NTT -> flatten, with one explicit transpose per half.

_SIX_STEP_MIN = 1 << 14


def _tree_map(f, *xs):
    return jax.tree.map(f, *xs, is_leaf=lambda t: isinstance(t, jnp.ndarray))


def _dit_stages_axis0(a, tw: fd.Fp2, n: int, mul_tw, add_op, sub_op):
    """Radix-2 DIT butterflies along axis 0 (bit-reversed in, natural out).

    `a` leaves shaped (n, *trailing); `tw` = w^0..w^(n/2-1)."""
    log_n = n.bit_length() - 1
    trailing = jax.tree.leaves(a)[0].shape[1:]
    tpad = (1,) * len(trailing)

    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        stride = n // m
        tws = (tw[0][::stride][:half].reshape(half, *tpad),
               tw[1][::stride][:half].reshape(half, *tpad))
        x = _tree_map(lambda t: t.reshape(n // m, 2, half, *trailing), a)
        u = _tree_map(lambda t: t[:, 0], x)
        v = _tree_map(lambda t: t[:, 1], x)
        v = mul_tw(v, tws)
        lo_half = add_op(u, v)
        hi_half = sub_op(u, v)
        x = _tree_map(lambda p, q: jnp.stack([p, q], axis=1), lo_half, hi_half)
        a = _tree_map(lambda t: t.reshape(n, *trailing), x)
    return a


def _bitrev_axis0(a, n: int):
    perm = jnp.asarray(bit_reverse_indices(n))
    return _tree_map(lambda t: jnp.take(t, perm, axis=0), a)


def _fp_mul_tw(v, tws):
    return fd.mul(v, tws)


def _ext3_mul_tw(v, tws):
    return fd.ext3_mul_base(v, tws)


def _split_n(n: int):
    log_n = n.bit_length() - 1
    l1 = log_n // 2
    return 1 << l1, 1 << (log_n - l1)


def _sixstep_twiddle(n: int, root: int) -> fd.Fp2:
    """T[k1, j2] = w^(k1*j2), shape (n1, n2), gathered from the full powers
    table (cached per (n, root))."""
    n1, n2 = _split_n(n)
    w = powers(root, n)
    k1 = np.arange(n1, dtype=np.uint64)[:, None]
    j2 = np.arange(n2, dtype=np.uint64)[None, :]
    idx = jnp.asarray(((k1 * j2) % n).astype(np.int32))
    return (w[0][idx], w[1][idx])


@functools.lru_cache(maxsize=64)
def _sixstep_twiddle_cached(n: int, root: int):
    out = _sixstep_twiddle(n, root)
    return jax.tree.map(jax.block_until_ready, out)


@functools.lru_cache(maxsize=64)
def _scale_brv_cached(n: int, offset: int):
    """offset^j1n2+j2 reshaped (n1, n2) with rows bit-reverse-permuted —
    the layout the first six-step kernel sees after its input bitrev."""
    n1, n2 = _split_n(n)
    tbl = powers(offset, n)
    m = (tbl[0].reshape(n1, n2), tbl[1].reshape(n1, n2))
    m = _bitrev_axis0(m, n1)
    return jax.tree.map(jax.block_until_ready, m)


@functools.lru_cache(maxsize=64)
def _ipost_cached(n: int, offset: int):
    """size_inv * offset_inv^i, flat (n,) device table."""
    size_inv = pow(n, P - 2, P)
    if offset == 1:
        out = fd.full((n,), size_inv)
    else:
        offset_inv = pow(offset % P, P - 2, P)
        tbl = powers(offset_inv, n)
        out = fd.mul(tbl, fd.full((n,), size_inv))
    return jax.tree.map(jax.block_until_ready, out)


def _use_pallas(n: int) -> bool:
    from . import runtime

    return (jax.default_backend() != "cpu" and n >= _SIX_STEP_MIN
            and not runtime.spmd())


def _ntt_sixstep_pallas_fp_batch(xb: fd.Fp2, n: int, root: int, tmat,
                                 pre=None, post=None) -> fd.Fp2:
    """Six-step NTT of a (B, n) batch of Fp vectors via the fused column
    kernel — ONE two-kernel pipeline transforms every column by folding the
    batch into the kernels' lane axis (L = B*n2, then B*n1), with the
    (n1, n2) twiddle/scale matrices cycling per column through the
    BlockSpec index maps (`lane_period`).  This is the batch-planner role
    of the reference's gpu/src/plan.rs, without its per-column encodes.

    `pre` = bitrev-row-permuted (n1, n2) coset-scale matrix folded into the
    first kernel's prologue; `post` = flat (n,) elementwise factor (1/n and
    inverse-coset powers for the iNTT) folded into the second kernel's
    epilogue slot.  The first kernel emits lazy mod-p representatives — the
    transpose/gather between the kernels is pure data movement and the
    second kernel's arithmetic accepts representatives."""
    from .ops import ntt_pallas

    n1, n2 = _split_n(n)
    B = xb[0].shape[0]
    # (B, n1, n2) -> (n1, B*n2): lanes carry (column, j2)
    x = _tree_map(
        lambda t: t.reshape(B, n1, n2).transpose(1, 0, 2).reshape(n1, B * n2),
        xb)
    x = _bitrev_axis0(x, n1)
    tw1 = ntt_pallas.stage_twiddles(pow(root, n2, P), n1)
    tmat2 = (tmat[0].reshape(n1, n2), tmat[1].reshape(n1, n2))
    x = ntt_pallas.col_ntt(x, tw1, tmat=tmat2, pre=pre, canon=False,
                           lane_period=n2)
    # (n1, B, n2) -> (n2, B*n1): lanes carry (column, k1).  This is the one
    # TRUE transpose in the pipeline — XLA's u32 transpose runs ~30x off
    # the HBM roofline (3.2 ms at 2^22, benches/ntt_ablate.py), so it goes
    # through the tiled Pallas transpose kernel instead.
    from .ops import transpose_pallas

    x = transpose_pallas.transpose_mid(
        x[0], x[1], B=B, interpret=jax.default_backend() == "cpu")
    x = _bitrev_axis0(x, n2)
    tw2 = ntt_pallas.stage_twiddles(pow(root, n1, P), n2)
    emat = (None if post is None else
            (post[0].reshape(n2, n1), post[1].reshape(n2, n1)))
    x = ntt_pallas.col_ntt(x, tw2, tmat=emat, lane_period=n1)
    # (n2, B, n1) -> (B, n): out[b, k2*n1 + k1] = D[k2, b, k1]
    return _tree_map(
        lambda t: t.reshape(n2, B, n1).transpose(1, 0, 2).reshape(B, n), x)


def _ntt_sixstep_pallas_fp(x2: fd.Fp2, n: int, root: int, tmat,
                           pre=None, post=None) -> fd.Fp2:
    """Six-step NTT of one flat (n,) Fp vector (B=1 batch)."""
    out = _ntt_sixstep_pallas_fp_batch(
        (x2[0].reshape(1, n), x2[1].reshape(1, n)), n, root, tmat,
        pre=pre, post=post)
    return (out[0].reshape(n), out[1].reshape(n))


def _ntt_core(a, tw: fd.Fp2, n: int, tmat, mul_tw, add_op, sub_op, root=None,
              pre=None, post=None):
    """Natural-order in/out NTT.  `a` leaves shaped (..., n).  `tmat` is the
    (n1, n2) six-step twiddle matrix (unused placeholder for small n).
    `root` (static int) enables the fused Pallas path on TPU; `pre`/`post`
    are elementwise factors folded into that path's kernels (callers apply
    them explicitly on the non-Pallas path)."""
    batch = jax.tree.leaves(a)[0].shape[:-1]

    if root is not None and _use_pallas(n):
        # ONE batched two-kernel pipeline for every component and batch
        # element: extension components and trace columns alike fold into
        # the kernels' lane axis
        comps = a if isinstance(a[0], tuple) else (a,)
        ncomp = len(comps)
        flats = [(c[0].reshape(-1, n), c[1].reshape(-1, n)) for c in comps]
        per = flats[0][0].shape[0]  # batch elements per component
        xb = (jnp.concatenate([f[0] for f in flats], axis=0),
              jnp.concatenate([f[1] for f in flats], axis=0))
        ob = _ntt_sixstep_pallas_fp_batch(xb, n, root, tmat,
                                          pre=pre, post=post)
        out_comps = []
        for k in range(ncomp):
            sl = slice(k * per, (k + 1) * per)
            comp = (ob[0][sl], ob[1][sl])
            out_comps.append(_tree_map(
                lambda t: t.reshape(*batch, n) if batch else t.reshape(n),
                comp))
        return tuple(out_comps) if isinstance(a[0], tuple) else out_comps[0]

    if n < _SIX_STEP_MIN:
        # stages along axis 0, batch trailing
        x = _tree_map(lambda t: jnp.moveaxis(t, -1, 0), a)
        x = _bitrev_axis0(x, n)
        x = _dit_stages_axis0(x, tw, n, mul_tw, add_op, sub_op)
        return _tree_map(lambda t: jnp.moveaxis(t, 0, -1), x)

    n1, n2 = _split_n(n)
    # M[j1, j2] = x[j1*n2 + j2]; column pass transforms j1 with (j2, batch)
    # trailing: layout (n1, n2, *batch)
    if batch:
        x = _tree_map(lambda t: jnp.moveaxis(t.reshape(*batch, n1, n2),
                                             tuple(range(len(batch))),
                                             tuple(range(2, 2 + len(batch)))), a)
    else:
        x = _tree_map(lambda t: t.reshape(n1, n2), a)
    tw1 = (tw[0][:: n // n1][: n1 // 2], tw[1][:: n // n1][: n1 // 2])
    tw2 = (tw[0][:: n // n2][: n2 // 2], tw[1][:: n // n2][: n2 // 2])

    x = _bitrev_axis0(x, n1)
    x = _dit_stages_axis0(x, tw1, n1, mul_tw, add_op, sub_op)  # C[k1, j2, ...]

    tpad = (1,) * len(batch)
    tmat = (tmat[0].reshape(n1, n2, *tpad), tmat[1].reshape(n1, n2, *tpad))
    x = mul_tw(x, tmat)

    x = _tree_map(lambda t: jnp.swapaxes(t, 0, 1), x)  # (n2:j2, n1:k1, ...)
    x = _bitrev_axis0(x, n2)
    x = _dit_stages_axis0(x, tw2, n2, mul_tw, add_op, sub_op)  # D[k2, k1, ...]

    if batch:
        x = _tree_map(lambda t: jnp.moveaxis(t, tuple(range(2, 2 + len(batch))),
                                             tuple(range(len(batch)))), x)
    return _tree_map(lambda t: t.reshape(*batch, n), x)


def _ntt_core_fp(a: fd.Fp2, tw: fd.Fp2, n: int, tmat, root=None,
                 pre=None, post=None) -> fd.Fp2:
    return _ntt_core(a, tw, n, tmat, _fp_mul_tw, fd.add, fd.sub, root,
                     pre=pre, post=post)


def _ntt_core_ext3(a: fd.Ext3, tw: fd.Fp2, n: int, tmat, root=None,
                   pre=None, post=None) -> fd.Ext3:
    return _ntt_core(a, tw, n, tmat, _ext3_mul_tw, fd.ext3_add, fd.ext3_sub,
                     root, pre=pre, post=post)


# ---------------------------------------------------------------------------
# evaluation domain
# ---------------------------------------------------------------------------

def _jitted_transform(kind: str, size: int, offset: int):
    from . import runtime

    return _jitted_transform_impl(kind, size, offset, runtime.spmd())


@functools.lru_cache(maxsize=None)
def _jitted_transform_impl(kind: str, size: int, offset: int, _spmd: bool):
    """Per-(domain, transform) jitted callables, shared across Domain
    instances.  Twiddle/scale tables are passed as runtime ARGUMENTS — baking
    them in as constants bloats the HLO with multi-megabyte literals that
    dominate (remote) compile time."""
    dom = Domain(size, offset)
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
        """offset * g^i for all i, natural order, on device (cached per
        (size, offset) — called every prove by eval/OOD/DEEP)."""
        key = (self.size, self.offset)
        hit = _ELEMENTS_CACHE.get(key)
        if hit is not None:
            return hit
        gpow = powers(self.group_gen, self.size)
        if self.offset == 1:
            return gpow
        out = fd.mul(gpow, fd.full(gpow[0].shape, self.offset))
        if isinstance(out[0], _Tracer):
            return out  # traced inline inside an outer jit; not cacheable
        if len(_ELEMENTS_CACHE) >= _POWERS_CACHE_MAX:
            _ELEMENTS_CACHE.pop(next(iter(_ELEMENTS_CACHE)))
        _ELEMENTS_CACHE[key] = out
        return out

    def get_coset(self, offset: int) -> "Domain":
        return Domain(self.size, offset)

    def offset_pow_size(self) -> int:
        return pow(self.offset, self.size, P)

    # -- transforms: Fp arrays (..., n) -------------------------------------
    # Public entry points dispatch to jitted, cached implementations.

    def fft_fp(self, coeffs: fd.Fp2) -> fd.Fp2:
        """coeffs (natural order) -> evals over the coset, natural order."""
        return _jitted_transform("fft_fp", self.size, self.offset)(
            coeffs, self._fwd_tbl(), self._scale_tbl(), self._fwd_tmat(),
            self._scale_brv_tbl())

    def ifft_fp(self, evals: fd.Fp2) -> fd.Fp2:
        return _jitted_transform("ifft_fp", self.size, self.offset)(
            evals, self._inv_tbl(), self._unscale_tbl(), self._inv_tmat(),
            self._ipost_tbl())

    def fft_bitrev_fp(self, coeffs: fd.Fp2) -> fd.Fp2:
        """Evaluations in bit-reversed order (protocol commitment order)."""
        return bit_reverse_fp(self.fft_fp(coeffs))

    def fft_ext3(self, coeffs: fd.Ext3) -> fd.Ext3:
        return _jitted_transform("fft_ext3", self.size, self.offset)(
            coeffs, self._fwd_tbl(), self._scale_tbl(), self._fwd_tmat(),
            self._scale_brv_tbl())

    def ifft_ext3(self, evals: fd.Ext3) -> fd.Ext3:
        return _jitted_transform("ifft_ext3", self.size, self.offset)(
            evals, self._inv_tbl(), self._unscale_tbl(), self._inv_tmat(),
            self._ipost_tbl())

    def fft_bitrev_ext3(self, coeffs: fd.Ext3) -> fd.Ext3:
        return bit_reverse_ext3(self.fft_ext3(coeffs))

    # -- implementations (traced under jit; tables are arguments) ------------

    def _fft_fp_impl(self, coeffs: fd.Fp2, tw: fd.Fp2, scale: fd.Fp2, tmat,
                     scale_brv) -> fd.Fp2:
        n = self.size
        coeffs = _zero_pad_fp(coeffs, n)
        fused = _use_pallas(n)
        if self.offset != 1 and not fused:
            coeffs = fd.mul(coeffs, scale)
        pre = scale_brv if (fused and self.offset != 1) else None
        return _ntt_core_fp(coeffs, tw, n, tmat, self.group_gen, pre=pre)

    def _ifft_fp_impl(self, evals: fd.Fp2, tw: fd.Fp2, unscale: fd.Fp2, tmat,
                      post) -> fd.Fp2:
        n = self.size
        fused = _use_pallas(n)
        out = _ntt_core_fp(evals, tw, n, tmat, self.group_gen_inv,
                           post=post if fused else None)
        if not fused:
            out = fd.mul(out, fd.full(out[0].shape, self.size_inv))
            if self.offset != 1:
                out = fd.mul(out, unscale)
        return out

    def _fft_ext3_impl(self, coeffs: fd.Ext3, tw: fd.Fp2, scale: fd.Fp2, tmat,
                       scale_brv) -> fd.Ext3:
        n = self.size
        coeffs = tuple(_zero_pad_fp(c, n) for c in coeffs)
        fused = _use_pallas(n)
        if self.offset != 1 and not fused:
            coeffs = fd.ext3_mul_base(coeffs, scale)
        pre = scale_brv if (fused and self.offset != 1) else None
        return _ntt_core_ext3(coeffs, tw, n, tmat, self.group_gen, pre=pre)

    def _ifft_ext3_impl(self, evals: fd.Ext3, tw: fd.Fp2, unscale: fd.Fp2,
                        tmat, post) -> fd.Ext3:
        n = self.size
        fused = _use_pallas(n)
        out = _ntt_core_ext3(evals, tw, n, tmat, self.group_gen_inv,
                             post=post if fused else None)
        if not fused:
            out = fd.ext3_mul_base(out, fd.full(out[0][0].shape, self.size_inv))
            if self.offset != 1:
                out = fd.ext3_mul_base(out, unscale)
        return out

    def _fwd_tbl(self) -> fd.Fp2:
        return powers(self.group_gen, max(self.size // 2, 1))

    def _inv_tbl(self) -> fd.Fp2:
        return powers(self.group_gen_inv, max(self.size // 2, 1))

    def _fwd_tmat(self):
        if self.size < _SIX_STEP_MIN:
            return fd.ones((1,))
        return _sixstep_twiddle_cached(self.size, self.group_gen)

    def _inv_tmat(self):
        if self.size < _SIX_STEP_MIN:
            return fd.ones((1,))
        return _sixstep_twiddle_cached(self.size, self.group_gen_inv)

    # -- internals ----------------------------------------------------------

    def _scale_tbl(self) -> fd.Fp2:
        if self.offset == 1:
            return fd.ones((1,))  # unused placeholder arg
        return powers(self.offset, self.size)

    def _unscale_tbl(self) -> fd.Fp2:
        if self.offset == 1:
            return fd.ones((1,))
        return powers(self.offset_inv, self.size)

    def _scale_brv_tbl(self) -> fd.Fp2:
        """Coset-scale powers as a bitrev-row-permuted (n1, n2) matrix,
        matching the first six-step kernel's post-bitrev prologue slot."""
        if self.offset == 1 or self.size < _SIX_STEP_MIN:
            return fd.ones((1,))
        return _scale_brv_cached(self.size, self.offset)

    def _ipost_tbl(self) -> fd.Fp2:
        """(1/n) * offset_inv^i, flat (n,), folded into the second inverse
        kernel's epilogue slot."""
        if self.size < _SIX_STEP_MIN:
            return fd.ones((1,))
        return _ipost_cached(self.size, self.offset)


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


def _host_tree_sum_np(lo, hi):
    from .fields import npfield

    a = npfield.from_limbs(lo, hi)
    n = a.shape[-1]
    while n > 1:
        half = n // 2
        s = npfield.add(a[..., :half], a[..., half:2 * half])
        if n % 2 == 1:
            a = np.concatenate([s, a[..., -1:]], axis=-1)
            n = half + 1
        else:
            a = s
            n = half
    return npfield.to_limbs(a[..., 0])


def _tree_sum_fp(a: fd.Fp2) -> fd.Fp2:
    """Sum along last axis via halving (log-depth, exact mod p).

    Each halving level sits behind an optimization_barrier: XLA:CPU
    re-fuses the chain into its producers with per-level recompute
    (a 4096-wide sum inside the OOD program measured 468 s) — the barrier
    pins each level's result.  (A host pure_callback was used before, but
    callbacks abort under SPMD when operands arrive sharded.)"""
    barrier = jax.default_backend() == "cpu"
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
        if barrier:
            a = jax.lax.optimization_barrier(a)
    return (a[0][..., 0], a[1][..., 0])


def _tree_sum_ext3(a: fd.Ext3) -> fd.Ext3:
    return tuple(_tree_sum_fp(c) for c in a)


def _ext3_powers_device(base: fd.Ext3, n: int) -> fd.Ext3:
    """[1, z, z^2, ..., z^(n-1)] by log-doubling (same shape as
    _powers_device; lax.associative_scan's lowering is both fat and —
    observed on this image — a flaky eager-compile path on XLA:CPU)."""
    one = ((jnp.ones((1,), fd.U32), jnp.zeros((1,), fd.U32)),
           (jnp.zeros((1,), fd.U32), jnp.zeros((1,), fd.U32)),
           (jnp.zeros((1,), fd.U32), jnp.zeros((1,), fd.U32)))
    if n == 1:
        return one
    out = one
    step = tuple((c[0].reshape(1), c[1].reshape(1)) for c in base)
    k = 1
    while k < n:
        take = min(k, n - k)
        chunk = tuple((c[0][:take], c[1][:take]) for c in out)
        stepb = tuple((jnp.broadcast_to(c[0], (take,)),
                       jnp.broadcast_to(c[1], (take,))) for c in step)
        nxt = fd.ext3_mul(chunk, stepb)
        out = jax.lax.optimization_barrier(tuple(
            (jnp.concatenate([o[0], x[0]]), jnp.concatenate([o[1], x[1]]))
            for o, x in zip(out, nxt)))
        if 2 * k < n:
            step = fd.ext3_mul(step, step)
        k *= 2
    return out


def poly_eval_ext3_at_ext3(coeffs: fd.Ext3, z) -> fd.Ext3:
    """Evaluate an Fq3-coefficient polynomial at an Fq3 scalar z on device."""
    n = coeffs[0][0].shape[-1]
    zdev = tuple(
        (jnp.asarray(np.uint32(int(c) & 0xFFFFFFFF)).reshape(1),
         jnp.asarray(np.uint32(int(c) >> 32)).reshape(1))
        for c in z)
    zp = _ext3_powers_device(zdev, n)
    terms = fd.ext3_mul(coeffs, zp)
    return _tree_sum_ext3(terms)


def poly_eval_fp_at_ext3(coeffs: fd.Fp2, z) -> fd.Ext3:
    """Evaluate an Fp-coefficient polynomial at an Fq3 point."""
    return poly_eval_ext3_at_ext3(fd.ext3_from_base(coeffs), z)
