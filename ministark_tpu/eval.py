"""Vectorized constraint evaluation over the CE domain.

This is where the reference's per-chunk CPU interpreter (src/eval_cpu.rs) and
abandoned one-kernel-per-node GPU evaluator (src/eval_gpu.rs) become a single
jitted whole-array program: the CSE'd composition DAG is walked once at trace
time; every node becomes array ops over the full CE domain, and XLA fuses the
lot into a handful of HBM passes.  Divisions become batched inversions
(Montgomery-trick scans), trace offsets become `jnp.roll` by
``offset * ce_blowup`` (the reference's cyclic `(i + step*offset) mod n`
indexing, src/eval_cpu.rs:115-134).

Values carry an Fp-vs-Fq tag implementing the reference's FieldVariant
promotion rules (src/utils.rs:329-357): Fp op Fq promotes to Fq.  Constants
stay host scalars until an array op forces materialization, so pure-constant
subtrees are folded for free.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .expression import (
    Challenge,
    CompositionCoeff,
    Constant,
    Hint,
    Periodic,
    Trace,
    X,
)
from .fields import device as fd
from .fields.scalar import Fp, Fq3, P


_DENOM_JIT_CACHE: dict = {}


class _Val:
    """Tagged evaluation value: host scalar constant or device array."""

    __slots__ = ("kind", "v", "is_const")

    def __init__(self, kind: str, v: Any, is_const: bool):
        self.kind = kind  # 'fp' | 'fq'
        self.v = v
        self.is_const = is_const


class VectorEvaluator:
    """Evaluates an Expr DAG over arrays of domain points.

    Parameters:
      n: domain size;
      ce_blowup: row-offset step (lde_step in the reference);
      fq_is_ext: whether Fq is the cubic extension (False when Fq == Fp).
    """

    def __init__(self, n: int, ce_blowup: int, fq_is_ext: bool):
        self.n = n
        self.ce_blowup = ce_blowup
        self.fq_is_ext = fq_is_ext

    # -- constants -----------------------------------------------------------

    def _const_val(self, c) -> _Val:
        if isinstance(c, Fq3):
            return _Val("fq", c, True)
        return _Val("fp", c if isinstance(c, Fp) else Fp(c), True)

    def _scalar_val(self, scalar) -> _Val:
        """A transcript scalar, preferably passed as a traced device value
        (0-d limb arrays) so changing it between proofs does NOT recompile.
        Ext3 = tuple of 3 limb pairs; Fp = one limb pair.  Host scalars
        (Fp/Fq3) are also accepted and baked as constants."""
        if isinstance(scalar, (Fp, Fq3, int)):
            return self._const_val(scalar)
        if isinstance(scalar[0], tuple):
            return _Val("fq", scalar, False)
        return _Val("fp", scalar, False)

    def _materialize(self, a: _Val) -> _Val:
        if not a.is_const:
            return a
        if a.kind == "fp":
            return _Val("fp", fd.full((self.n,), a.v.v), False)
        c = a.v if isinstance(a.v, Fq3) else Fq3.from_base(a.v)
        return _Val(
            "fq",
            (fd.full((self.n,), c.c0.v), fd.full((self.n,), c.c1.v), fd.full((self.n,), c.c2.v)),
            False,
        )

    def _promote(self, a: _Val, kind: str) -> _Val:
        """Promote fp -> fq when fq is an extension; no-op otherwise."""
        if a.kind == kind or kind == "fp" or not self.fq_is_ext:
            if a.kind != kind:
                return _Val(kind, a.v, a.is_const)
            return a
        if a.is_const:
            return _Val("fq", Fq3.from_base(a.v), True)
        return _Val("fq", fd.ext3_from_base(a.v), False)

    # -- ops with promotion --------------------------------------------------

    def _binop(self, a: _Val, b: _Val, fp_op, fq_op, scalar_op) -> _Val:
        kind = "fq" if (a.kind == "fq" or b.kind == "fq") else "fp"
        if a.is_const and b.is_const:
            return _Val(kind, scalar_op(a.v, b.v), True)
        a = self._materialize(self._promote(a, kind))
        b = self._materialize(self._promote(b, kind))
        op = fq_op if (kind == "fq" and self.fq_is_ext) else fp_op
        return _Val(kind, op(a.v, b.v), False)

    def add(self, a, b):
        return self._binop(a, b, fd.add, fd.ext3_add, lambda x, y: x + y)

    def mul(self, a, b):
        return self._binop(a, b, fd.mul, fd.ext3_mul, lambda x, y: x * y)

    def neg(self, a: _Val) -> _Val:
        if a.is_const:
            return _Val(a.kind, -a.v, True)
        op = fd.ext3_neg if (a.kind == "fq" and self.fq_is_ext) else fd.neg
        return _Val(a.kind, op(a.v), False)

    def div(self, a: _Val, b: _Val) -> _Val:
        if b.is_const:
            return self.mul(a, _Val(b.kind, b.v.inverse(), True))
        is_ext = b.kind == "fq" and self.fq_is_ext
        leaf_arr = b.v[0][0] if is_ext else b.v[0]
        if leaf_arr.ndim == 0:
            binv_v = (fd.ext3_inv(b.v, host_scalar_inv=True) if is_ext
                      else fd.inv_via_host(b.v))
        else:
            binv_v = fd.ext3_batch_inv(b.v) if is_ext else fd.batch_inv(b.v)
        return self.mul(a, _Val(b.kind, binv_v, False))

    def pow(self, a: _Val, e: int) -> _Val:
        if a.is_const:
            return _Val(a.kind, a.v ** e, True)
        op = fd.ext3_pow_const if (a.kind == "fq" and self.fq_is_ext) else fd.pow_const
        return _Val(a.kind, op(a.v, e), False)

    # -- leaf handling -------------------------------------------------------

    def leaf_value(self, leaf, ctx) -> _Val:
        """ctx: dict with x_lde (Fp2 array), base_cols (list of Fp2 columns),
        ext_cols (list of Ext3 columns), challenges, hints (scalar lists),
        composition_coeffs (scalar list), trace_len."""
        if isinstance(leaf, X):
            return _Val("fp", ctx["x_lde"], False)
        if isinstance(leaf, Constant):
            return self._const_val(leaf.value)
        if isinstance(leaf, Challenge):
            return self._scalar_val(ctx["challenges"][leaf.index])
        if isinstance(leaf, Hint):
            return self._scalar_val(ctx["hints"][leaf.index])
        if isinstance(leaf, CompositionCoeff):
            return self._scalar_val(ctx["composition_coeffs"][leaf.index])
        if isinstance(leaf, Trace):
            shift = self.ce_blowup * leaf.offset
            num_base = len(ctx["base_cols"])
            if leaf.column < num_base:
                col = ctx["base_cols"][leaf.column]
                rolled = (jnp.roll(col[0], -shift), jnp.roll(col[1], -shift))
                return _Val("fp", rolled, False)
            col = ctx["ext_cols"][leaf.column - num_base]
            rolled = tuple((jnp.roll(c[0], -shift), jnp.roll(c[1], -shift)) for c in col)
            return _Val("fq", rolled, False)
        if isinstance(leaf, Periodic):
            # value at x = P_coeffs(x^(trace_len / interval_size))
            # (src/verifier.rs:221-230 semantics)
            k = ctx["trace_len"] // leaf.interval_size
            base = _Val("fp", fd.pow_const(ctx["x_lde"], k), False)
            acc = self._const_val(leaf.coeffs[-1])
            for c in reversed(leaf.coeffs[:-1]):
                acc = self.add(self.mul(acc, base), self._const_val(c))
            return acc
        raise TypeError(f"unknown leaf {leaf!r}")

    # -- driver --------------------------------------------------------------

    def evaluate_raw(self, expr, ctx) -> _Val:
        """Memoized DAG evaluation returning a tagged _Val.

        If ctx contains "_div_inverses" (str key -> device inverse array) and
        "_key_memo" (id(denominator node) -> str key), Div nodes with a
        precomputed denominator inverse become multiplications."""
        div_inverses = ctx.get("_div_inverses")
        key_memo = ctx.get("_key_memo", {})
        memo = {}
        for node in expr.postorder_unique():
            nid = id(node)
            if node.op == "leaf":
                memo[nid] = self.leaf_value(node.leaf, ctx)
            elif node.op == "neg":
                memo[nid] = self.neg(memo[id(node.a)])
            elif node.op == "add":
                memo[nid] = self.add(memo[id(node.a)], memo[id(node.b)])
            elif node.op == "mul":
                memo[nid] = self.mul(memo[id(node.a)], memo[id(node.b)])
            elif node.op == "div":
                inv = None
                if div_inverses is not None:
                    k = key_memo.get(id(node.b))
                    if k is not None:
                        inv = div_inverses.get(k)
                if inv is not None:
                    # Ext3 is a tuple of limb-pairs; Fp2 is a pair of arrays
                    kind = "fq" if self.fq_is_ext and isinstance(inv[0], tuple) else "fp"
                    memo[nid] = self.mul(memo[id(node.a)], _Val(kind, inv, False))
                else:
                    memo[nid] = self.div(memo[id(node.a)], memo[id(node.b)])
            elif node.op == "pow":
                memo[nid] = self.pow(memo[id(node.a)], node.exp)
            else:
                raise ValueError(node.op)
        return memo[id(expr)]

    def evaluate(self, expr, ctx):
        """Returns the final value as a device array promoted to Fq."""
        out = self.evaluate_raw(expr, ctx)
        out = self._materialize(self._promote(out, "fq"))
        return out.v


def as_col_views(base_in):
    """Per-column [(lo, hi), ...] views of trace columns.

    Accepts either that list directly or a whole (ncols, n) limb-matrix pair
    — the prover passes the matrix form so the slicing happens INSIDE the
    jitted consumers (traced slices are free; eager per-column slices cost a
    relay dispatch each, ~2 ms through the remote-TPU tunnel)."""
    if (isinstance(base_in, tuple) and len(base_in) == 2
            and getattr(base_in[0], "ndim", 1) == 2):
        lo, hi = base_in
        return [(lo[c], hi[c]) for c in range(lo.shape[0])]
    return list(base_in)


def as_ext_col_views(ext_in):
    """Ext3 analogue of as_col_views: accepts a list of per-column Ext3
    values or an Ext3 of (ncols, n) limb matrices."""
    if not ext_in:
        return []
    if getattr(ext_in[0][0], "ndim", 1) == 2:
        comps = ext_in
        nc = comps[0][0].shape[0]
        return [tuple((c[0][k], c[1][k]) for c in comps) for k in range(nc)]
    return list(ext_in)


def _structural_key(node, memo):
    """Structural hash key of a DAG node (for cross-term denominator dedup)."""
    nid = id(node)
    if nid in memo:
        return memo[nid]
    if node.op == "leaf":
        k = ("leaf", node.leaf.key())
    elif node.op in ("neg",):
        k = ("neg", _structural_key(node.a, memo))
    elif node.op == "pow":
        k = ("pow", _structural_key(node.a, memo), node.exp)
    else:
        k = (node.op, _structural_key(node.a, memo), _structural_key(node.b, memo))
    memo[nid] = k
    return k


def _top_sum_terms(expr):
    """Split the composition expression at its top-level Add spine: one term
    per constraint (air.compose_constraints builds a left-fold sum)."""
    terms = []
    stack = [expr]
    while stack:
        node = stack.pop()
        if node.op == "add":
            stack.append(node.a)
            stack.append(node.b)
        else:
            terms.append(node)
    return terms


def eval_composition(
    air,
    composition_coeffs,
    challenges,
    hints,
    x_lde,
    base_cols,
    ext_cols,
):
    """Evaluate the air's composition constraint over the CE domain.

    Device inputs: x_lde (Fp2, natural order over CE domain), base_cols (list
    of Fp2 CE-domain column LDEs), ext_cols (list of Ext3 or None).

    Compilation strategy: XLA compile time is superlinear in graph size, so
    instead of tracing the whole composition DAG into one program we
      1. hoist every Div denominator, batch-inverting each DISTINCT
         denominator exactly once (also a runtime win: the reference
         re-inverts per Div node, src/eval_cpu.rs:280-295);
      2. evaluate the sum one constraint-term at a time, each as its own
         modest jitted program, accumulating on device.
    The arithmetic (mod-p exact) is identical to single-program evaluation.

    Returns the composition evaluations as an Fq device array (Ext3 if the
    air's Fq is the cubic extension, else Fp2).
    """
    fq_is_ext = getattr(air.config, "fq_type", Fp) is Fq3
    n = air.trace_len * air.ce_blowup_factor

    import os as _os

    if (jax.default_backend() == "cpu"
            and _os.environ.get("MINISTARK_EVAL", "numpy") == "numpy"
            and _os.environ.get("MINISTARK_TPU_FUSED_EVAL") != "interpret"):
        # eager numpy path (src/eval_cpu.rs analogue): JAX tracing costs
        # ~0.3ms per op on one core — for the brainfuck-sized DAGs that's
        # HOURS; numpy runs the same mod-p vector math eagerly in seconds
        return eval_composition_numpy(
            air, composition_coeffs, challenges, hints, x_lde,
            base_cols, ext_cols)

    ev = VectorEvaluator(n, air.ce_blowup_factor, fq_is_ext)
    # ONE stacked host->device upload for every transcript scalar: the
    # brainfuck transcript carries ~11 challenges + ~100 Fq3 composition
    # coefficients, and per-scalar 0-d uploads cost a relay round-trip EACH
    # (~300 tiny transfers dominated the warm prove, docs/RESULTS.md).  The
    # traced programs slice individual limbs back out for free.
    packed, layout = _pack_scalars({
        "challenges": challenges,
        "hints": hints,
        "composition_coeffs": composition_coeffs,
    })
    ctx = {
        "x_lde": x_lde,
        "base_cols": base_cols,
        "ext_cols": ext_cols or [],
        "trace_len": air.trace_len,
    }

    expr = air.composition_constraint.expr
    terms = _top_sum_terms(expr)

    # -- phase 1: denominator inverses, deduped structurally -----------------
    # (string keys: jit canonicalizes dict pytrees by sorting keys)
    raw_memo = {}
    key_memo = {}
    denom_by_key = {}
    for node in expr.postorder_unique():
        if node.op == "div":
            k = repr(_structural_key(node.b, raw_memo))
            key_memo[id(node.b)] = k
            denom_by_key.setdefault(k, node.b)

    # ALL denominator inverses in ONE jitted dispatch; the jit wrapper is
    # cached by AIR/shape signature so re-proving (or proving again with a
    # fresh Air of the same config+size) never re-traces or recompiles.
    from . import runtime as _rt2
    air_sig = (type(air.config).__qualname__
               if not isinstance(air.config, type)
               else air.config.__qualname__,
               air.trace_len, air.ce_blowup_factor, n, fq_is_ext,
               tuple(sorted(denom_by_key)), repr(layout), _rt2.spmd())
    if air_sig not in _DENOM_JIT_CACHE:
        denom_items = tuple(sorted(denom_by_key.items()))
        trace_len = air.trace_len

        def run_denoms(x_lde_in, base_in, ext_in, packed_in):
            c = {"x_lde": x_lde_in, "base_cols": as_col_views(base_in),
                 "ext_cols": as_ext_col_views(ext_in),
                 "trace_len": trace_len,
                 **_unpack_scalars(packed_in, layout)}
            out = {}
            for k, dnode in denom_items:
                val = ev._materialize(ev.evaluate_raw(dnode, c))
                if val.kind == "fq" and fq_is_ext:
                    out[k] = fd.ext3_batch_inv(val.v)
                elif fq_is_ext:
                    # invert in the base field (3x cheaper), then promote:
                    # the fused-eval plan types every inverse input as Ext3
                    # when fq is the extension (eval_pallas._rewrite_divs)
                    out[k] = fd.ext3_from_base(fd.batch_inv(val.v))
                else:
                    out[k] = fd.batch_inv(val.v)
            return out

        _DENOM_JIT_CACHE[air_sig] = jax.jit(run_denoms)
    inv_by_key = _DENOM_JIT_CACHE[air_sig](
        x_lde, base_cols, ext_cols or [], packed)

    # -- phase 2: term evaluation --------------------------------------------
    # Off-CPU the fused Pallas kernels evaluate term groups entirely in VMEM
    # (XLA:TPU runs each u32 op as a separate HBM pass); the CPU/test path
    # keeps per-term XLA jits.
    from . import runtime as _rt
    use_fused = _rt.fused_ok("MINISTARK_TPU_FUSED_EVAL")
    if use_fused and n % (512 * 8) == 0:
        from .ops.eval_pallas import eval_composition_fused

        return eval_composition_fused(
            air, composition_coeffs, challenges, hints, x_lde, base_cols,
            ext_cols, inv_by_key, key_memo,
            interpret=jax.default_backend() == "cpu")

    @jax.jit
    def add_fq(acc, term):
        if fq_is_ext:
            return fd.ext3_add(acc, term)
        return fd.add(acc, term)

    def make_run_term(term):
        def run_term(x_lde_in, base_in, ext_in, invs, packed_in):
            c = dict(ctx)
            c["x_lde"] = x_lde_in
            c["base_cols"] = as_col_views(base_in)
            c["ext_cols"] = as_ext_col_views(ext_in)
            c.update(_unpack_scalars(packed_in, layout))
            c["_div_inverses"] = invs
            c["_key_memo"] = key_memo
            out = ev.evaluate_raw(term, c)
            out = ev._materialize(ev._promote(out, "fq"))
            return out.v
        return jax.jit(run_term)

    args = (x_lde, base_cols, ext_cols or [], inv_by_key, packed)
    fns = [make_run_term(t) for t in terms]
    # XLA compiles release the GIL: compile all terms concurrently (big win
    # on the CPU backend where each term costs tens of seconds to compile)
    import concurrent.futures as _fut
    import os as _os
    with _fut.ThreadPoolExecutor(max_workers=min(16, _os.cpu_count() or 8)) as ex:
        compiled = list(ex.map(lambda f: f.lower(*args).compile(), fns))

    acc = None
    for fn in compiled:
        tv = fn(*args)
        acc = tv if acc is None else add_fq(acc, tv)
    return acc


def _pack_scalars(groups):
    """Stack every transcript scalar into ONE (S,) u32 limb-pair upload.

    Returns ((s_lo, s_hi), layout) where layout maps each group name to a
    tuple of ('fp' | 'fq', flat_offset) entries.  The layout is static per
    AIR config (scalar counts and kinds don't change between proofs), so
    jitted consumers key their cache on ``repr(layout)`` and slice limbs
    back out inside the trace for free."""
    flat: list[int] = []
    layout = {}
    for name, vals in groups.items():
        entry = []
        for v in vals:
            if isinstance(v, Fq3):
                entry.append(("fq", len(flat)))
                flat.extend([v.c0.v, v.c1.v, v.c2.v])
            else:
                entry.append(("fp", len(flat)))
                flat.append(v.v if isinstance(v, Fp) else int(v))
        layout[name] = tuple(entry)
    arr = np.array(flat or [0], dtype=np.uint64)
    packed = (jnp.asarray((arr & 0xFFFFFFFF).astype(np.uint32)),
              jnp.asarray((arr >> 32).astype(np.uint32)))
    return packed, layout


def _unpack_scalars(packed, layout):
    """Rebuild the per-group scalar lists (Ext3 = 3 limb pairs, Fp = one)
    from the stacked upload.  Call INSIDE a traced program."""
    s_lo, s_hi = packed
    out = {}
    for name, entry in layout.items():
        lst = []
        for kind, off in entry:
            if kind == "fq":
                lst.append(tuple((s_lo[off + k], s_hi[off + k])
                                 for k in range(3)))
            else:
                lst.append((s_lo[off], s_hi[off]))
        out[name] = lst
    return out


def _scalar_to_device(v):
    """Host scalar (Fp | Fq3) -> 0-d device limb pair(s)."""
    if isinstance(v, Fq3):
        return tuple(
            (jnp.asarray(np.uint32(c.v & 0xFFFFFFFF)), jnp.asarray(np.uint32(c.v >> 32)))
            for c in (v.c0, v.c1, v.c2))
    vv = v.v if isinstance(v, Fp) else int(v)
    return (jnp.asarray(np.uint32(vv & 0xFFFFFFFF)), jnp.asarray(np.uint32(vv >> 32)))


# ---------------------------------------------------------------------------
# eager numpy evaluator (the src/eval_cpu.rs analogue)
# ---------------------------------------------------------------------------

def eval_composition_numpy(air, composition_coeffs, challenges, hints,
                           x_lde, base_cols, ext_cols):
    """One memoized postorder walk of the composition DAG with numpy u64
    vector arithmetic (fields/npfield.py).

    No tracing, no compilation, and shared sub-DAGs (hash-consed by the
    composition compiler) evaluate exactly once — including each distinct
    Div denominator, which the reference re-inverts per node
    (src/eval_cpu.rs:280-295).
    """
    from .fields import npfield as nf

    fq_is_ext = getattr(air.config, "fq_type", Fp) is Fq3
    trace_len = air.trace_len
    ce_blowup = air.ce_blowup_factor

    x = nf.from_limbs(*x_lde)
    base = [nf.from_limbs(*c) for c in as_col_views(base_cols)]
    ext = [tuple(nf.from_limbs(*comp) for comp in c)
           for c in as_ext_col_views(ext_cols or [])]

    def scal(v):
        """Host scalar -> ('fp', u64) or ('fq', 3-tuple)."""
        if isinstance(v, Fq3):
            return ("fq", (nf.U64(v.c0.v), nf.U64(v.c1.v), nf.U64(v.c2.v)))
        vv = v.v if isinstance(v, Fp) else int(v) % P
        return ("fp", nf.U64(vv))

    def promote(val):
        kind, v = val
        if kind == "fq" or not fq_is_ext:
            return val
        if np.ndim(v) == 0:
            return ("fq", (v, nf.U64(0), nf.U64(0)))
        return ("fq", nf.ext3_from_base(v))

    def binop(a, b, fp_op, fq_op):
        if fq_is_ext and (a[0] == "fq" or b[0] == "fq"):
            return ("fq", fq_op(promote(a)[1], promote(b)[1]))
        return ("fp", fp_op(a[1], b[1]))

    def leaf_value(leaf):
        if isinstance(leaf, X):
            return ("fp", x)
        if isinstance(leaf, Constant):
            return scal(leaf.value)
        if isinstance(leaf, Challenge):
            return scal(challenges[leaf.index])
        if isinstance(leaf, Hint):
            return scal(hints[leaf.index])
        if isinstance(leaf, CompositionCoeff):
            return scal(composition_coeffs[leaf.index])
        if isinstance(leaf, Trace):
            shift = ce_blowup * leaf.offset
            if leaf.column < len(base):
                return ("fp", np.roll(base[leaf.column], -shift))
            col = ext[leaf.column - len(base)]
            return ("fq", tuple(np.roll(c, -shift) for c in col))
        if isinstance(leaf, Periodic):
            k = trace_len // leaf.interval_size
            xb = nf.pow_const(x, k)
            cv = leaf.coeffs[-1]
            acc = nf.full(x.shape, cv.v if isinstance(cv, Fp) else int(cv))
            for c in reversed(leaf.coeffs[:-1]):
                cc = c.v if isinstance(c, Fp) else int(c)
                acc = nf.add(nf.mul(acc, xb), nf.U64(cc))
            return ("fp", acc)
        raise TypeError(f"unknown leaf {leaf!r}")

    expr = air.composition_constraint.expr
    memo = {}
    for node in expr.postorder_unique():
        nid = id(node)
        if node.op == "leaf":
            memo[nid] = leaf_value(node.leaf)
        elif node.op == "neg":
            k, v = memo[id(node.a)]
            memo[nid] = (k, nf.ext3_neg(v) if k == "fq" else nf.neg(v))
        elif node.op == "add":
            memo[nid] = binop(memo[id(node.a)], memo[id(node.b)],
                              nf.add, nf.ext3_add)
        elif node.op == "mul":
            memo[nid] = binop(memo[id(node.a)], memo[id(node.b)],
                              nf.mul, nf.ext3_mul)
        elif node.op == "div":
            bk, bv = memo[id(node.b)]
            inv = nf.ext3_inv(bv) if bk == "fq" else nf.inv(bv)
            memo[nid] = binop(memo[id(node.a)], (bk, inv),
                              nf.mul, nf.ext3_mul)
        elif node.op == "pow":
            k, v = memo[id(node.a)]
            memo[nid] = (k, nf.ext3_pow_const(v, node.exp) if k == "fq"
                         else nf.pow_const(v, node.exp))
        else:
            raise ValueError(node.op)

    kind, out = promote(memo[id(expr)])
    if fq_is_ext:
        return tuple(
            tuple(jnp.asarray(l) for l in nf.to_limbs(
                np.broadcast_to(c, x.shape)))
            for c in out)
    return tuple(jnp.asarray(l) for l in nf.to_limbs(
        np.broadcast_to(out, x.shape)))
