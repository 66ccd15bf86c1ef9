"""Pallas TPU kernel: fused DEEP composition over the LDE domain.

The DEEP LDE (src/composer.rs:89-188 semantics, assembled pointwise as in
src/verifier.rs:238-297) is a sum of quotient terms

    acc(x) = sum_t  alpha_t * (T_t(x) - ood_t) * inv_t(x)        (inv_t = 1/(x - y_t))
    deep(x) = acc(x) * (A + B*x)

XLA:TPU runs every uint32 op in that chain as a separate HBM pass, so the
eager/jit formulation reads each 2^23-point column dozens of times.  Here a
GROUP of terms evaluates inside VMEM per tile: one HBM read per distinct
column/inverse plane, one accumulator write per group.

Transcript scalars (alphas, OOD values, degree-adjust pair) enter through a
packed (S, 1) uint32-limb table — reproving with a new transcript reuses the
compiled kernels.

Terms use the rearrangement (ood - T(x)) * (1/(y - x)) == (T(x) - ood)/(x - y)
so the precomputed barycentric inverses 1/(y - x_i) are consumed directly
(no negation in the hot loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import device as fd

BLOCK_R = 8
BLOCK_C = 512
TILE = BLOCK_R * BLOCK_C
GROUP_EXT = 8
GROUP_BASE = 16


class _Handle:
    """Hashable kernel wrapper so jit can key on kernel identity."""

    def __init__(self, fn, key):
        self.fn = fn
        self.key = key

    def __hash__(self):
        return hash(self.key)

    def __eq__(self, other):
        return isinstance(other, _Handle) and self.key == other.key


_KERNEL_CACHE: dict = {}


def _scalar_pair(s_lo, s_hi, slot, shape):
    return (jnp.full(shape, s_lo[slot, 0], jnp.uint32),
            jnp.full(shape, s_hi[slot, 0], jnp.uint32))


def _group_kernel_ext(term_descrs, n_cols_planes, n_inv_planes):
    """term_descrs: per term (col_kind, col_plane_base, inv_plane_base,
    ood_slot, alpha_slot); col_kind 'fp' (2 planes) or 'ext' (6 planes)."""

    def kernel(*refs):
        s_lo, s_hi = refs[0], refs[1]
        acc_refs = refs[2:8]
        col_refs = refs[8:8 + n_cols_planes]
        inv_refs = refs[8 + n_cols_planes:8 + n_cols_planes + n_inv_planes]
        out_refs = refs[8 + n_cols_planes + n_inv_planes:]
        shape = acc_refs[0].shape

        def sp(slot):
            return _scalar_pair(s_lo, s_hi, slot, shape)

        acc = tuple((acc_refs[2 * k][:], acc_refs[2 * k + 1][:])
                    for k in range(3))
        for (kind, cb, ib, ood_slot, alpha_slot) in term_descrs:
            ood = tuple(sp(ood_slot + k) for k in range(3))
            alpha = tuple(sp(alpha_slot + k) for k in range(3))
            inv = tuple((inv_refs[ib + 2 * k][:], inv_refs[ib + 2 * k + 1][:])
                        for k in range(3))
            if kind == "fp":
                col = (col_refs[cb][:], col_refs[cb + 1][:])
                diff = (fd.sub(ood[0], col), ood[1], ood[2])
            else:
                col = tuple((col_refs[cb + 2 * k][:],
                             col_refs[cb + 2 * k + 1][:]) for k in range(3))
                diff = fd.ext3_sub(ood, col)
            acc = fd.ext3_add(acc, fd.ext3_mul(fd.ext3_mul(diff, inv), alpha))
        k = 0
        for lo, hi in acc:
            out_refs[k][:] = lo
            out_refs[k + 1][:] = hi
            k += 2

    return kernel


def _group_kernel_base(term_descrs, n_cols_planes, n_inv_planes):
    def kernel(*refs):
        s_lo, s_hi = refs[0], refs[1]
        acc_refs = refs[2:4]
        col_refs = refs[4:4 + n_cols_planes]
        inv_refs = refs[4 + n_cols_planes:4 + n_cols_planes + n_inv_planes]
        out_refs = refs[4 + n_cols_planes + n_inv_planes:]
        shape = acc_refs[0].shape

        acc = (acc_refs[0][:], acc_refs[1][:])
        for (_kind, cb, ib, ood_slot, alpha_slot) in term_descrs:
            ood = _scalar_pair(s_lo, s_hi, ood_slot, shape)
            alpha = _scalar_pair(s_lo, s_hi, alpha_slot, shape)
            col = (col_refs[cb][:], col_refs[cb + 1][:])
            inv = (inv_refs[ib][:], inv_refs[ib + 1][:])
            acc = fd.add(acc, fd.mul(fd.mul(fd.sub(ood, col), inv), alpha))
        out_refs[0][:] = acc[0]
        out_refs[1][:] = acc[1]

    return kernel


def _finish_kernel_ext():
    def kernel(s_lo, s_hi, a0, a1, a2, a3, a4, a5, xlo, xhi,
               o0, o1, o2, o3, o4, o5):
        shape = a0.shape
        da = tuple(_scalar_pair(s_lo, s_hi, k, shape) for k in range(3))
        db = tuple(_scalar_pair(s_lo, s_hi, 3 + k, shape) for k in range(3))
        acc = ((a0[:], a1[:]), (a2[:], a3[:]), (a4[:], a5[:]))
        adj = fd.ext3_add(da, fd.ext3_mul_base(db, (xlo[:], xhi[:])))
        out = fd.ext3_mul(acc, adj)
        for k, ref in enumerate((o0, o1, o2, o3, o4, o5)):
            ref[:] = out[k // 2][k % 2]

    return kernel


def _finish_kernel_base():
    def kernel(s_lo, s_hi, a0, a1, xlo, xhi, o0, o1):
        shape = a0.shape
        da = _scalar_pair(s_lo, s_hi, 0, shape)
        db = _scalar_pair(s_lo, s_hi, 1, shape)
        out = fd.mul((a0[:], a1[:]), fd.add(da, fd.mul(db, (xlo[:], xhi[:]))))
        o0[:] = out[0]
        o1[:] = out[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("handle", "n_out", "interpret"))
def _run(s_lo, s_hi, arrays, *, handle, n_out, interpret=False):
    rows = arrays[0].shape[0]
    grid = (rows // BLOCK_R,)
    vspec = pl.BlockSpec((BLOCK_R, BLOCK_C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((s_lo.shape[0], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        handle.fn,
        grid=grid,
        in_specs=[sspec, sspec] + [vspec] * len(arrays),
        out_specs=tuple([vspec] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct(arrays[0].shape, jnp.uint32)
                        for _ in range(n_out)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s_lo, s_hi, *arrays)


def _shape2(a, rows):
    return a.reshape(rows, BLOCK_C)


def deep_lde_fused(*, n, fq_is_ext, terms, col_planes, inv_planes,
                   s_lo, s_hi, d_lo, d_hi, x, plan_key, interpret=False):
    """Fused DEEP LDE core (traceable: runs inside `_deep_program`'s jit).

    terms: list of (col_key, inv_key, ood_index, alpha_index) where indices
        address the packed scalar table rows (1 slot for base, 3 for ext).
    col_planes: dict col_key -> Fp2 (n,) | Ext3 (n,); kind inferred.
    inv_planes: dict inv_key -> Fp2 | Ext3 (matching fq_is_ext).
    s_lo/s_hi: (S, 1) uint32 packed transcript scalars (alphas + OOD values).
    d_lo/d_hi: (2 or 6, 1) uint32 packed degree-adjust pair.
    x: Fp2 (n,) LDE domain points.
    plan_key: hashable AIR/shape identity for the kernel cache.
    Returns Ext3 if fq_is_ext else Fp2, shape (n,).
    """
    assert n % TILE == 0, f"LDE size {n} too small for fused DEEP"
    rows = n // BLOCK_C
    group_size = GROUP_EXT if fq_is_ext else GROUP_BASE
    n_out = 6 if fq_is_ext else 2

    def planes_of(v):
        if len(v) == 3 and isinstance(v[0], tuple):
            return [p for comp in v for p in comp], "ext"
        return [v[0], v[1]], "fp"

    acc = (fd.ext3_zeros((rows, BLOCK_C)) if fq_is_ext
           else fd.zeros((rows, BLOCK_C)))
    acc_flat = ([p for comp in acc for p in comp] if fq_is_ext
                else [acc[0], acc[1]])

    for g0 in range(0, len(terms), group_size):
        group = terms[g0:g0 + group_size]
        # dedupe columns and inverses within the group
        cols_order, inv_order = [], []
        col_base, inv_base = {}, {}
        arrays = []
        descrs = []
        n_col_planes = 0
        for (ck, ik, _oi, _ai) in group:
            if ck not in col_base:
                planes, kind = planes_of(col_planes[ck])
                col_base[ck] = (n_col_planes, kind)
                cols_order.append((ck, planes))
                n_col_planes += len(planes)
        for (ck, ik, _oi, _ai) in group:
            if ik not in inv_base:
                planes, _ = planes_of(inv_planes[ik])
                inv_base[ik] = sum(len(p) for _, p in inv_order)
                inv_order.append((ik, planes))
        n_inv_planes = sum(len(p) for _, p in inv_order)
        for (ck, ik, oi, ai) in group:
            cb, kind = col_base[ck]
            descrs.append((kind, cb, inv_base[ik], oi, ai))

        kkey = (plan_key, "group", g0, fq_is_ext,
                tuple((d[0], d[1], d[2], d[3], d[4]) for d in descrs),
                n_col_planes, n_inv_planes)
        if kkey not in _KERNEL_CACHE:
            fn = (_group_kernel_ext(tuple(descrs), n_col_planes, n_inv_planes)
                  if fq_is_ext else
                  _group_kernel_base(tuple(descrs), n_col_planes,
                                     n_inv_planes))
            _KERNEL_CACHE[kkey] = _Handle(fn, kkey)
        handle = _KERNEL_CACHE[kkey]

        arrays = list(acc_flat)
        for _, planes in cols_order:
            arrays += [_shape2(p, rows) for p in planes]
        for _, planes in inv_order:
            arrays += [_shape2(p, rows) for p in planes]
        out = _run(s_lo, s_hi, tuple(arrays), handle=handle, n_out=n_out,
                   interpret=interpret)
        acc_flat = list(out)

    # degree adjustment
    fkey = ("finish", fq_is_ext)
    if fkey not in _KERNEL_CACHE:
        fn = _finish_kernel_ext() if fq_is_ext else _finish_kernel_base()
        _KERNEL_CACHE[fkey] = _Handle(fn, fkey)
    arrays = tuple(acc_flat) + (_shape2(x[0], rows), _shape2(x[1], rows))
    out = _run(d_lo, d_hi, arrays, handle=_KERNEL_CACHE[fkey], n_out=n_out,
               interpret=interpret)

    flat = [a.reshape(n) for a in out]
    if fq_is_ext:
        return tuple((flat[2 * k], flat[2 * k + 1]) for k in range(3))
    return (flat[0], flat[1])

# ---------------------------------------------------------------------------
# ONE-DISPATCH wrapper: slicing + every group kernel + finish in a single jit
# ---------------------------------------------------------------------------
# The first cut of this op sliced each trace/composition column and inverse
# row into its own device array on the host, then launched one pallas_call
# per term group — ~300 tiny dispatches per prove.  Through the remote-TPU
# relay each dispatch carries ~1-2 ms of fixed cost, which made the warm
# DEEP phase 0.6 s at a 2^14-point domain (brainfuck hello_world) where the
# arithmetic itself is <5 ms.  Wrapping the WHOLE phase in one jitted
# program (column slices traced, kernels inlined) collapses it to a single
# dispatch; transcript scalars stay traced inputs so reproving never
# recompiles.


@functools.lru_cache(maxsize=None)
def _deep_program(plan, npts, n, fq_is_ext, comp_is_ext, nb, ne, nc,
                  plan_key, interpret):
    """plan: tuple of (kind, col, inv_j, ood_slot, alpha_slot); kind in
    {"b" (base trace), "e" (extension trace), "c" (composition)}; inv_j
    indexes the stacked (npts, n) barycentric-inverse planes."""

    def prog(base, ext, comp, invs, s_lo, s_hi, d_lo, d_hi, x):
        col_planes = {}
        inv_planes = {}
        terms = []
        for (kind, col, inv_j, oi, ai) in plan:
            ck = (kind, col)
            if ck not in col_planes:
                if kind == "b":
                    col_planes[ck] = (base[0][col], base[1][col])
                elif kind == "e":
                    col_planes[ck] = tuple((c[0][col], c[1][col])
                                           for c in ext)
                elif comp_is_ext:
                    col_planes[ck] = tuple((c[0][col], c[1][col])
                                           for c in comp)
                else:
                    col_planes[ck] = (comp[0][col], comp[1][col])
            if inv_j not in inv_planes:
                if fq_is_ext:
                    inv_planes[inv_j] = tuple((c[0][inv_j], c[1][inv_j])
                                              for c in invs)
                else:
                    inv_planes[inv_j] = (invs[0][inv_j], invs[1][inv_j])
            terms.append((ck, inv_j, oi, ai))
        return deep_lde_fused(
            n=n, fq_is_ext=fq_is_ext, terms=terms, col_planes=col_planes,
            inv_planes=inv_planes, s_lo=s_lo, s_hi=s_hi, d_lo=d_lo,
            d_hi=d_hi, x=x, plan_key=plan_key, interpret=interpret)

    return jax.jit(prog)


def _pack_scalar_table(vals):
    return (jnp.asarray(np.array([[v & 0xFFFFFFFF] for v in vals],
                                 np.uint32)),
            jnp.asarray(np.array([[v >> 32] for v in vals], np.uint32)))


def deep_lde_onejit(*, n, fq_is_ext, comp_is_ext, plan, npts, base, ext,
                    comp, invs, scalar_vals, degree_vals, x, plan_key,
                    interpret=False):
    """Run the whole fused DEEP LDE as one device program.

    base: Fp2 (nb, n) limb pair; ext: Ext3 of (ne, n) pairs or () when the
    AIR has no extension trace; comp: (nc, n) planes (Ext3 or Fp2 per
    comp_is_ext); invs: stacked (npts, n) planes straight from the OOD
    program; scalar_vals/degree_vals: flat slot-expanded ints.
    """
    nb = base[0].shape[0]
    ne = ext[0][0].shape[0] if ext else 0
    nc = (comp[0][0] if comp_is_ext else comp[0]).shape[0]
    prog = _deep_program(tuple(plan), npts, n, fq_is_ext, comp_is_ext,
                         nb, ne, nc, plan_key, interpret)
    s_lo, s_hi = _pack_scalar_table(scalar_vals)
    d_lo, d_hi = _pack_scalar_table(degree_vals)
    return prog(base, ext, comp, invs, s_lo, s_hi, d_lo, d_hi, x)
