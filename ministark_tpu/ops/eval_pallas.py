"""Pallas TPU kernel: fused constraint evaluation over the CE domain.

This succeeds where the reference's eval_gpu.rs failed (one Metal kernel per
DAG node lost to the CPU and was disabled, src/air.rs:104-118): a GROUP of
constraint terms evaluates entirely inside VMEM per tile — one HBM read per
distinct input array, one write per group.

Plan (host, once per Air shape):
  * Trace(col, offset) leaves -> pre-rolled input arrays (deduped);
  * X -> the CE-domain points; Periodic columns -> precomputed LDEs;
  * Div(a, b) -> Mul(a, inv_input) with the batched inverse of each
    structurally-distinct denominator computed once outside;
  * Constants / challenges / hints / composition coefficients -> one packed
    (num, 1) scalar-limb table, so re-proving never recompiles;
  * terms grouped (GROUP_SIZE per kernel) to bound Mosaic graph size.

All arrays are uint32 limb planes reshaped (n/BLOCK_C, BLOCK_C); the kernel
walks the DAG postorder with eval.VectorEvaluator's Fp/Fq3 promotion rules.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..expression import (
    Challenge,
    CompositionCoeff,
    Constant,
    Expr,
    Hint,
    Periodic,
    Trace,
    X,
)
from ..fields import device as fd
from ..fields.scalar import Fp, Fq3, P

BLOCK_R = 8
BLOCK_C = 512
GROUP_SIZE = 6


@dataclass(frozen=True)
class _InvInput:
    """Leaf standing for a precomputed denominator-inverse input."""
    key: str
    is_ext: bool

    def key_(self):
        return ("invinput", self.key)


class _KVal:
    __slots__ = ("kind", "v")

    def __init__(self, kind, v):
        self.kind = kind  # 'fp' -> Fp2 ; 'fq' -> Ext3
        self.v = v


def _rewrite_divs(expr: Expr, key_memo: dict, fq_is_ext: bool) -> Expr:
    """Replace Div(a, b) with Mul(a, InvInput(structural_key(b)))."""
    memo = {}
    for node in expr.postorder_unique():
        nid = id(node)
        if node.op == "leaf":
            memo[nid] = node
        elif node.op == "neg":
            memo[nid] = Expr("neg", a=memo[id(node.a)])
        elif node.op == "pow":
            memo[nid] = Expr("pow", a=memo[id(node.a)], exp=node.exp)
        elif node.op == "div":
            k = key_memo[id(node.b)]
            inv_leaf = Expr.from_leaf(_InvInput(k, fq_is_ext))
            memo[nid] = Expr("mul", a=memo[id(node.a)], b=inv_leaf)
        else:
            memo[nid] = Expr(node.op, a=memo[id(node.a)], b=memo[id(node.b)])
    return memo[id(expr)]


def _leaf_key(leaf):
    if isinstance(leaf, _InvInput):
        return leaf.key_()
    return leaf.key()


def build_plan(terms, key_memo, fq_is_ext: bool, num_base: int):
    """Assign every leaf to an input slot or scalar slot.

    Returns (rewritten_terms, leaf_map, input_descrs, scalar_descrs) where
    input_descrs: list of ('trace', col, offset) | ('x',) | ('periodic', leaf)
                  | ('inv', key) with ext flags,
    scalar_descrs: list of ('const', value) | ('challenge', i) | ...
    leaf_map: leaf key -> ('input_fp'|'input_fq', plane_base) |
                          ('scalar_fp'|'scalar_fq', slot)."""
    rewritten = [ _rewrite_divs(t, key_memo, fq_is_ext) for t in terms ]
    leaf_map = {}
    input_descrs = []
    scalar_descrs = []
    plane_count = 0
    scalar_count = 0

    def add_input(key, descr, is_ext):
        nonlocal plane_count
        planes = 6 if is_ext else 2
        leaf_map[key] = (("input_fq" if is_ext else "input_fp"), plane_count)
        input_descrs.append((descr, is_ext))
        plane_count += planes

    def add_scalar(key, descr, is_ext):
        nonlocal scalar_count
        slots = 3 if is_ext else 1
        leaf_map[key] = (("scalar_fq" if is_ext else "scalar_fp"), scalar_count)
        scalar_descrs.append((descr, is_ext))
        scalar_count += slots

    for t in rewritten:
        for leaf in t.leaves():
            k = _leaf_key(leaf)
            if k in leaf_map:
                continue
            if isinstance(leaf, X):
                add_input(k, ("x",), False)
            elif isinstance(leaf, Trace):
                add_input(k, ("trace", leaf.column, leaf.offset),
                          fq_is_ext and leaf.column >= num_base)
            elif isinstance(leaf, Periodic):
                add_input(k, ("periodic", leaf), False)
            elif isinstance(leaf, _InvInput):
                add_input(k, ("inv", leaf.key), leaf.is_ext)
            elif isinstance(leaf, Constant):
                add_scalar(k, ("const", leaf.value), isinstance(leaf.value, Fq3))
            elif isinstance(leaf, Challenge):
                add_scalar(k, ("challenge", leaf.index), fq_is_ext)
            elif isinstance(leaf, Hint):
                add_scalar(k, ("hint", leaf.index), fq_is_ext)
            elif isinstance(leaf, CompositionCoeff):
                add_scalar(k, ("ccoeff", leaf.index), fq_is_ext)
            else:
                raise TypeError(leaf)
    return rewritten, leaf_map, input_descrs, scalar_descrs


def _kernel_factory(term_exprs, leaf_lookup, fq_is_ext):
    def kernel(*refs):
        s_lo = refs[0]
        s_hi = refs[1]
        n_in = leaf_lookup["num_planes"]
        in_refs = refs[2:2 + n_in]
        out_refs = refs[2 + n_in:]
        shape = in_refs[0].shape if n_in else out_refs[0].shape

        def scalar_pair(slot):
            return (jnp.full(shape, s_lo[slot, 0], jnp.uint32),
                    jnp.full(shape, s_hi[slot, 0], jnp.uint32))

        def leaf_val(leaf):
            kind, payload = leaf_lookup["map"][_leaf_key(leaf)]
            if kind == "input_fp":
                return _KVal("fp", (in_refs[payload][:], in_refs[payload + 1][:]))
            if kind == "input_fq":
                return _KVal("fq", tuple(
                    (in_refs[payload + 2 * k][:], in_refs[payload + 2 * k + 1][:])
                    for k in range(3)))
            if kind == "scalar_fp":
                return _KVal("fp", scalar_pair(payload))
            if kind == "scalar_fq":
                return _KVal("fq", tuple(scalar_pair(payload + k) for k in range(3)))
            raise AssertionError(kind)

        def promote(val):
            if val.kind == "fq" or not fq_is_ext:
                return val
            return _KVal("fq", fd.ext3_from_base(val.v))

        def binop(a, b, fp_op, fq_op):
            if fq_is_ext and (a.kind == "fq" or b.kind == "fq"):
                return _KVal("fq", fq_op(promote(a).v, promote(b).v))
            return _KVal("fp", fp_op(a.v, b.v))

        acc = None
        for expr in term_exprs:
            memo = {}
            for node in expr.postorder_unique():
                nid = id(node)
                if node.op == "leaf":
                    memo[nid] = leaf_val(node.leaf)
                elif node.op == "neg":
                    a = memo[id(node.a)]
                    op = fd.ext3_neg if (a.kind == "fq" and fq_is_ext) else fd.neg
                    memo[nid] = _KVal(a.kind, op(a.v))
                elif node.op == "add":
                    memo[nid] = binop(memo[id(node.a)], memo[id(node.b)],
                                      fd.add, fd.ext3_add)
                elif node.op == "mul":
                    memo[nid] = binop(memo[id(node.a)], memo[id(node.b)],
                                      fd.mul, fd.ext3_mul)
                elif node.op == "pow":
                    a = memo[id(node.a)]
                    op = (fd.ext3_pow_const if (a.kind == "fq" and fq_is_ext)
                          else fd.pow_const)
                    memo[nid] = _KVal(a.kind, op(a.v, node.exp))
                else:
                    raise AssertionError(node.op)
            val = promote(memo[id(expr)])
            if acc is None:
                acc = val
            else:
                acc = _KVal(val.kind,
                            (fd.ext3_add if fq_is_ext else fd.add)(acc.v, val.v))

        planes = acc.v if fq_is_ext else (acc.v,)
        k = 0
        for lo, hi in planes:
            out_refs[k][:] = lo
            out_refs[k + 1][:] = hi
            k += 2

    return kernel


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

_DRIVER_CACHE = {}


def eval_composition_fused(air, composition_coeffs, challenges, hints,
                           x_lde, base_cols, ext_cols, inv_by_key, key_memo,
                           interpret=False):
    """Fused-kernel evaluation of the composition constraint over the CE
    domain. Signature mirrors eval.eval_composition phase 2 (inverses are
    supplied precomputed)."""
    from .. import eval as _eval

    fq_is_ext = air.config.fq_type is Fq3
    n = air.trace_len * air.ce_blowup_factor
    expr = air.composition_constraint.expr
    terms = _eval._top_sum_terms(expr)
    num_base = air.config.NUM_BASE_COLUMNS

    rewritten, leaf_map, input_descrs, scalar_descrs = build_plan(
        terms, key_memo, fq_is_ext, num_base)

    rows = n // BLOCK_C
    assert n % BLOCK_C == 0 and rows % BLOCK_R == 0, f"CE size {n} too small for fused path"
    ce_blowup = air.ce_blowup_factor
    trace_len = air.trace_len

    # ---- scalar table -------------------------------------------------------
    def scalar_values():
        vals = []
        for (descr, is_ext) in scalar_descrs:
            kind = descr[0]
            if kind == "const":
                v = descr[1]
            elif kind == "challenge":
                v = challenges[descr[1]]
            elif kind == "hint":
                v = hints[descr[1]]
            elif kind == "ccoeff":
                v = composition_coeffs[descr[1]]
            else:
                raise AssertionError(descr)
            if is_ext:
                v = v if isinstance(v, Fq3) else Fq3.from_base(v)
                vals += [v.c0.v, v.c1.v, v.c2.v]
            else:
                vals.append(v.v if isinstance(v, Fp) else int(v))
        return vals

    svals = scalar_values()
    if not svals:
        svals = [0]
    s_lo = jnp.asarray(np.array([[v & 0xFFFFFFFF] for v in svals], np.uint32))
    s_hi = jnp.asarray(np.array([[v >> 32] for v in svals], np.uint32))

    # ---- ONE cached jitted driver: input assembly + every group kernel -----
    # (the remote-TPU relay charges latency per dispatch; folding the rolls,
    # the periodic mini-LDEs and all pallas group calls into one program makes
    # the whole phase a single device round-trip, compiled once per AIR shape)
    n_out = 6 if fq_is_ext else 2
    air_key = (type(air.config).__qualname__ if not isinstance(air.config, type)
               else air.config.__qualname__,
               trace_len, ce_blowup, n, fq_is_ext, interpret)
    if air_key not in _DRIVER_CACHE:
        num_planes = sum((6 if is_ext else 2) for (_d, is_ext) in input_descrs)
        lookup = {"map": dict(leaf_map), "num_planes": num_planes}
        handles = []
        for g in range(0, len(rewritten), GROUP_SIZE):
            group = rewritten[g:g + GROUP_SIZE]
            handles.append(_kernel_factory(group, lookup, fq_is_ext))
        descrs = tuple(input_descrs)

        def driver(x_in, base_in, ext_in, invs_in, slo, shi):
            from ..eval import as_col_views, as_ext_col_views

            base_in = as_col_views(base_in)
            ext_in = as_ext_col_views(ext_in)

            def shape2(arr):
                return arr.reshape(rows, BLOCK_C)

            inputs = []
            for (descr, is_ext) in descrs:
                kind = descr[0]
                if kind == "x":
                    inputs += [shape2(x_in[0]), shape2(x_in[1])]
                elif kind == "trace":
                    col, offset = descr[1], descr[2]
                    shift = ce_blowup * offset
                    if col < num_base:
                        c = base_in[col]
                        inputs += [shape2(jnp.roll(c[0], -shift)),
                                   shape2(jnp.roll(c[1], -shift))]
                    else:
                        c = ext_in[col - num_base]
                        for comp in c:
                            inputs += [shape2(jnp.roll(comp[0], -shift)),
                                       shape2(jnp.roll(comp[1], -shift))]
                elif kind == "periodic":
                    leaf = descr[1]
                    k = trace_len // leaf.interval_size
                    base = fd.pow_const(x_in, k)
                    c_last = leaf.coeffs[-1]
                    acc_ = fd.full((n,), c_last.v if isinstance(c_last, Fp)
                                   else int(c_last))
                    for c in reversed(leaf.coeffs[:-1]):
                        cv = c.v if isinstance(c, Fp) else int(c)
                        acc_ = fd.add(fd.mul(acc_, base), fd.full((n,), cv))
                    inputs += [shape2(acc_[0]), shape2(acc_[1])]
                elif kind == "inv":
                    inv = invs_in[descr[1]]
                    if is_ext:
                        for comp in inv:
                            inputs += [shape2(comp[0]), shape2(comp[1])]
                    else:
                        inputs += [shape2(inv[0]), shape2(inv[1])]
                else:
                    raise AssertionError(descr)

            vspec = pl.BlockSpec((BLOCK_R, BLOCK_C), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
            sspec = pl.BlockSpec((slo.shape[0], 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
            acc = None
            for kernel in handles:
                out = pl.pallas_call(
                    kernel,
                    grid=(rows // BLOCK_R,),
                    in_specs=[sspec, sspec] + [vspec] * len(inputs),
                    out_specs=tuple([vspec] * n_out),
                    out_shape=tuple(
                        jax.ShapeDtypeStruct((rows, BLOCK_C), jnp.uint32)
                        for _ in range(n_out)),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                    interpret=interpret,
                )(slo, shi, *inputs)
                if acc is None:
                    acc = out
                elif fq_is_ext:
                    a = tuple((acc[2 * k], acc[2 * k + 1]) for k in range(3))
                    b = tuple((out[2 * k], out[2 * k + 1]) for k in range(3))
                    s = fd.ext3_add(a, b)
                    acc = tuple(x for comp in s for x in comp)
                else:
                    s = fd.add((acc[0], acc[1]), (out[0], out[1]))
                    acc = (s[0], s[1])

            flat = [a.reshape(n) for a in acc]
            if fq_is_ext:
                return tuple((flat[2 * k], flat[2 * k + 1]) for k in range(3))
            return (flat[0], flat[1])

        _DRIVER_CACHE[air_key] = jax.jit(driver)

    return _DRIVER_CACHE[air_key](
        x_lde, base_cols, ext_cols or [], inv_by_key, s_lo, s_hi)
