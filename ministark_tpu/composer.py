"""DEEP polynomial composition, evaluation-space (reference: src/composer.rs).

The reference computes OOD evaluations by Horner over coefficients and the
DEEP polynomial by per-column synthetic division in coefficient space
(src/composer.rs:43-188, src/utils.rs:154-175) — sequential recurrences that
map poorly to wide hardware.  Both have exact evaluation-space equivalents
over data the prover already holds (the natural-order LDEs):

* OOD evaluation by **barycentric interpolation** over the LDE coset
  {o*g^i, i<N}:     P(y) = (y^N - o^N)/(N*o^(N-1)) * sum_i  e_i*g^i/(y - x_i)
  -> one batched inversion of (y - x_i) per OOD point, shared by every
  column; per column a multiply + log-depth tree sum.

* The DEEP "polynomial" is only ever consumed as its LDE (src/prover.rs:148),
  so it is assembled pointwise by the same quotient formula the verifier
  uses (src/verifier.rs:238-297):
      deep(x_i) = [ sum_j a_j*(T_j(x_i) - T_j(z*g^off_j))/(x_i - z*g^off_j)
                  + sum_k c_k*(C_k(x_i) - C_k(z^m))/(x_i - z^m) ] * (A + B*x_i)

Values are bit-identical to the coefficient-space path (exact mod-p algebra),
while every step is an elementwise map or a batched inversion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fields import device as fd
from .fields.scalar import Fp, Fq3, P
from .ntt import powers, _tree_sum_fp


class DeepCompositionCoeffs:
    """(execution_trace alphas, composition_trace alphas, (alpha,beta) degree
    pair) — one alpha per trace argument / composition column
    (src/stark.rs:41-53)."""

    def __init__(self, execution_trace, composition_trace, degree):
        self.execution_trace = list(execution_trace)
        self.composition_trace = list(composition_trace)
        self.degree = degree


def scalar_to_ext3(v) -> Fq3:
    return v if isinstance(v, Fq3) else Fq3.from_base(v)


def fq3_to_device_scalar(v: Fq3) -> fd.Ext3:
    return tuple(
        (jnp.asarray(c.v & 0xFFFFFFFF, fd.U32), jnp.asarray(c.v >> 32, fd.U32))
        for c in (v.c0, v.c1, v.c2)
    )


# ---------------------------------------------------------------------------
# the OOD program: ONE jitted dispatch for all barycentric work
# ---------------------------------------------------------------------------
# The remote-TPU relay charges ~50-150ms latency per dispatch, so the whole
# OOD phase — (y - x) differences, batched inversions, weighted tree sums for
# every (point, column) pair — runs as a single compiled program, cached by
# shape signature.  OOD points enter as traced inputs: a new transcript never
# recompiles.

def _ood_program(n: int, nb: int, ne: int, nc: int, npts: int,
                 fq_is_ext: bool):
    from . import runtime

    return _ood_program_impl(n, nb, ne, nc, npts, fq_is_ext, runtime.spmd())


@functools.lru_cache(maxsize=None)
def _ood_program_impl(n: int, nb: int, ne: int, nc: int, npts: int,
                      fq_is_ext: bool, _spmd: bool):
    """Returns a compiled-on-first-use jitted fn.

    Inputs (fq_is_ext=True):
      ys:   Ext3 (npts,)  — distinct OOD points; LAST one is z^m
      x:    Fp2 (n,)      — LDE domain points
      gpow: Fp2 (n,)      — g^i table
      base: (nb, n) Fp2; ext: (ne, n) Ext3 or (); comp: (nc, n) Ext3
    Outputs:
      trace_sums: Ext3 (npts-1, nb+ne) — unscaled barycentric sums
      comp_sums:  Ext3 (nc,)
      invs:       Ext3 (npts, n) — 1/(y_j - x_i), reused by the DEEP pass
    When fq_is_ext=False every Ext3 above is an Fp2 pair instead.
    """

    def prog_fp(ys, x, gpow, base, comp):
        yb = (ys[0][:, None], ys[1][:, None])
        diff = fd.sub(yb, (x[0][None, :], x[1][None, :]))
        invs = fd.batch_inv(diff)
        t_sums, c_sums = [], []
        for j in range(npts):
            w = fd.mul((invs[0][j], invs[1][j]), gpow)  # (n,)
            if j < npts - 1:
                prod = fd.mul(base, (w[0][None, :], w[1][None, :]))
                t_sums.append(_tree_sum_fp(prod))  # (nb,)
            else:
                prod = fd.mul(comp, (w[0][None, :], w[1][None, :]))
                c_sums = _tree_sum_fp(prod)  # (nc,)
        trace_sums = (jnp.stack([s[0] for s in t_sums]),
                      jnp.stack([s[1] for s in t_sums]))
        return trace_sums, c_sums, invs

    def prog_ext(ys, x, gpow, base, ext, comp):
        yb = tuple((c[0][:, None], c[1][:, None]) for c in ys)
        xe = fd.ext3_from_base((x[0][None, :], x[1][None, :]))
        diff = fd.ext3_sub(yb, xe)
        invs = fd.ext3_batch_inv(diff)
        # trace columns as Ext3: base promoted (zero c1/c2) + ext
        zeros_b = jnp.zeros_like(base[0])
        base_e = ((base[0], base[1]), (zeros_b, zeros_b), (zeros_b, zeros_b))
        if ne:
            tcols = tuple(
                (jnp.concatenate([base_e[k][0], ext[k][0]], axis=0),
                 jnp.concatenate([base_e[k][1], ext[k][1]], axis=0))
                for k in range(3))
        else:
            tcols = base_e
        t_sums, c_sums = [], None
        for j in range(npts):
            inv_j = tuple((c[0][j], c[1][j]) for c in invs)
            w = fd.ext3_mul_base(inv_j, gpow)  # Ext3 (n,)
            wb = tuple((c[0][None, :], c[1][None, :]) for c in w)
            if j < npts - 1:
                prod = fd.ext3_mul(tcols, wb)
                t_sums.append(tuple(_tree_sum_fp(c) for c in prod))
            else:
                prod = fd.ext3_mul(comp, wb)
                c_sums = tuple(_tree_sum_fp(c) for c in prod)
        trace_sums = tuple(
            (jnp.stack([s[k][0] for s in t_sums]),
             jnp.stack([s[k][1] for s in t_sums]))
            for k in range(3))
        return trace_sums, c_sums, invs

    if fq_is_ext:
        return jax.jit(prog_ext)
    return jax.jit(prog_fp)


class DeepPolyComposer:
    """Evaluation-space DEEP composer.

    Inputs are the natural-order device LDEs of: base trace (Matrix),
    extension trace (MatrixExt3 | None), composition trace (Matrix or
    MatrixExt3) — the same arrays the prover committed to.
    """

    def __init__(self, air, z, base_lde, extension_lde, composition_lde):
        self.air = air
        self.z = z
        self.base_lde = base_lde
        self.extension_lde = extension_lde
        self.composition_lde = composition_lde
        self.fq_is_ext = isinstance(z, Fq3)
        self.lde_dom = air.lde_domain()
        self._cache = None

    # -- OOD points ----------------------------------------------------------

    def _zq(self) -> Fq3:
        return scalar_to_ext3(self.z)

    def _trace_points(self) -> list[tuple[int, int, Fq3]]:
        td = self.air.trace_domain()
        z = self._zq()
        pts = []
        for (col, offset) in self.air.trace_arguments():
            gen = td.group_gen if offset >= 0 else td.group_gen_inv
            pts.append((col, offset, z * Fp(pow(gen, abs(offset), P))))
        return pts

    def _distinct_point_keys(self):
        """Distinct OOD point keys (insertion order) + values; the
        composition point z^m is always LAST."""
        keys, vals = [], []
        for (_col, off, y) in self._trace_points():
            if ("t", off) not in keys:
                keys.append(("t", off))
                vals.append(y)
        m = self.composition_lde.num_cols
        keys.append(("c", 0))
        vals.append(self._zq() ** m)
        return keys, vals

    def _scale_of(self, y: Fq3) -> Fq3:
        """Barycentric prefactor (y^N - o^N) / (N * o^(N-1)) — exact host
        arithmetic."""
        dom = self.lde_dom
        return (y ** dom.size - Fp(dom.offset_pow_size())) / (
            Fp(dom.size) * Fp(pow(dom.offset, dom.size - 1, P)))

    def _base_as_ext3(self) -> fd.Ext3:
        m = self.base_lde
        zeros = jnp.zeros_like(m.lo)
        return ((m.lo, m.hi), (zeros, zeros), (zeros, zeros))

    def _comp_as_ext3(self) -> fd.Ext3:
        m = self.composition_lde
        if hasattr(m, "as_ext3"):
            return m.as_ext3()
        zeros = jnp.zeros_like(m.lo)
        return ((m.lo, m.hi), (zeros, zeros), (zeros, zeros))

    # -- OOD evaluations (src/composer.rs:43-86 semantics) ---------------------

    def get_ood_evals(self):
        """All OOD evaluations in ONE device dispatch + ONE host readback
        (the relay charges high latency per dispatch; see _ood_program)."""
        trace_pts = self._trace_points()
        point_keys, point_vals = self._distinct_point_keys()
        dom = self.lde_dom
        n = dom.size
        nb = self.base_lde.num_cols
        ne = (self.extension_lde.num_cols
              if self.extension_lde is not None else 0)
        nc = self.composition_lde.num_cols
        npts = len(point_vals)

        x = dom.elements_device()
        gpow = powers(dom.group_gen, n)
        prog = _ood_program(n, nb, ne, nc, npts, self.fq_is_ext)

        if self.fq_is_ext:
            ys = tuple(
                (jnp.asarray(np.array(
                    [getattr(p, f"c{k}").v & 0xFFFFFFFF for p in point_vals],
                    np.uint32)),
                 jnp.asarray(np.array(
                     [getattr(p, f"c{k}").v >> 32 for p in point_vals],
                     np.uint32)))
                for k in range(3))
            ext_in = (self.extension_lde.as_ext3() if ne else ())
            trace_sums, comp_sums, invs = prog(
                ys, x, gpow, (self.base_lde.lo, self.base_lde.hi), ext_in,
                self._comp_as_ext3())
            ts, cs = jax.device_get((trace_sums, comp_sums))

            def tval(j, i):
                return Fq3(*[int(ts[k][0][j][i]) | (int(ts[k][1][j][i]) << 32)
                             for k in range(3)])

            def cval(i):
                return Fq3(*[int(cs[k][0][i]) | (int(cs[k][1][i]) << 32)
                             for k in range(3)])
        else:
            vals = [p.c0.v for p in point_vals]  # c1 = c2 = 0 when fq == fp
            ys = (jnp.asarray(np.array([v & 0xFFFFFFFF for v in vals],
                                       np.uint32)),
                  jnp.asarray(np.array([v >> 32 for v in vals], np.uint32)))
            m = self.composition_lde
            trace_sums, comp_sums, invs = prog(
                ys, x, gpow, (self.base_lde.lo, self.base_lde.hi),
                (m.lo, m.hi))
            ts, cs = jax.device_get((trace_sums, comp_sums))

            def tval(j, i):
                return Fq3.from_base(Fp(int(ts[0][j][i])
                                        | (int(ts[1][j][i]) << 32)))

            def cval(i):
                return Fq3.from_base(Fp(int(cs[0][i]) | (int(cs[1][i]) << 32)))

        scales = [self._scale_of(y) for y in point_vals]
        execution_oods = []
        for (col, off, _y) in trace_pts:
            j = point_keys.index(("t", off))
            execution_oods.append(tval(j, col) * scales[j])
        composition_oods = [cval(i) * scales[-1] for i in range(nc)]

        self._cache = (trace_pts, point_keys, invs, execution_oods,
                       composition_oods)
        if not self.fq_is_ext:
            return ([self._demote(v) for v in execution_oods],
                    [self._demote(v) for v in composition_oods])
        return execution_oods, composition_oods

    def _inv_slice(self, key):
        """1/(y - x) vector for a distinct-point key, sliced from the OOD
        program's stacked output (Ext3 when fq is the extension, else Fp2)."""
        trace_pts, point_keys, invs, _e, _c = self._cache
        j = point_keys.index(key)
        if self.fq_is_ext:
            return tuple((c[0][j], c[1][j]) for c in invs)
        return (invs[0][j], invs[1][j])

    def _demote(self, v: Fq3):
        assert v.c1.is_zero() and v.c2.is_zero(), "OOD eval not in base field"
        return v.c0

    # -- DEEP LDE (replaces into_deep_poly + its re-evaluation) ----------------

    def deep_lde(self, coeffs: DeepCompositionCoeffs) -> fd.Ext3:
        """The DEEP composition evaluated over the LDE domain, natural order
        (what FRI consumes). One jitted program; transcript scalars enter as
        traced inputs so reproving never recompiles."""
        assert self._cache is not None, "call get_ood_evals first"
        trace_pts, point_keys, invs, exec_oods, comp_oods = self._cache
        dom = self.lde_dom
        n = dom.size
        num_base = self.base_lde.num_cols
        num_comp = self.composition_lde.num_cols
        col_plan = tuple((col, off) for (col, off, _y) in trace_pts)

        from . import runtime
        use_fused = runtime.fused_ok("MINISTARK_TPU_FUSED_DEEP")
        if use_fused and n % (512 * 8) == 0:
            return self._deep_lde_fused(
                coeffs, interpret=jax.default_backend() == "cpu")

        base_cols = self._base_as_ext3()
        ext_cols = self.extension_lde.as_ext3() if self.extension_lde is not None else None
        comp_cols = self._comp_as_ext3()

        def _ext_inv(key):
            iv = self._inv_slice(key)
            return iv if self.fq_is_ext else fd.ext3_from_base(iv)

        inv_t = {off: _ext_inv(("t", off)) for (_c, off, _y) in trace_pts}
        inv_offsets = tuple(sorted(inv_t))
        inv_arrays = [inv_t[o] for o in inv_offsets]
        inv_c = _ext_inv(("c", 0))

        dev = fq3_to_device_scalar
        exec_alphas = [dev(scalar_to_ext3(a)) for a in coeffs.execution_trace]
        comp_alphas = [dev(scalar_to_ext3(a)) for a in coeffs.composition_trace]
        exec_oods_d = [dev(_as_fq3(o)) for o in exec_oods]
        comp_oods_d = [dev(_as_fq3(o)) for o in comp_oods]
        da = dev(scalar_to_ext3(coeffs.degree[0]))
        db = dev(scalar_to_ext3(coeffs.degree[1]))
        x = dom.elements_device()

        def bview(s):
            return tuple((jnp.broadcast_to(c[0], (n,)), jnp.broadcast_to(c[1], (n,)))
                         for c in s)

        # chunked jits: XLA compile time is superlinear in graph size, so the
        # sum over quotient terms runs in small groups — ONE compile serves
        # every full group (identical pytree structure), so small is fast
        CHUNK = 2

        @jax.jit
        def exec_chunk(acc, cols, invs_sel, oods, alphas):
            for cv, iv, o, al in zip(cols, invs_sel, oods, alphas):
                diff = fd.ext3_sub(cv, bview(o))
                term = fd.ext3_mul(diff, fd.ext3_neg(iv))
                acc = fd.ext3_add(acc, fd.ext3_mul(term, bview(al)))
            return acc

        @jax.jit
        def finish(acc, da_, db_, x_):
            adj = fd.ext3_add(bview(da_), fd.ext3_mul_base(bview(db_), x_))
            return fd.ext3_mul(acc, adj)

        def col_vals(col):
            if col < num_base:
                return tuple((c[0][col], c[1][col]) for c in base_cols)
            return tuple((c[0][col - num_base], c[1][col - num_base])
                         for c in ext_cols)

        inv_by_off = dict(zip(inv_offsets, inv_arrays))
        acc = fd.ext3_zeros((n,))
        items = [
            (col_vals(col), inv_by_off[off], exec_oods_d[j], exec_alphas[j])
            for j, (col, off) in enumerate(col_plan)
        ] + [
            (tuple((c[0][k], c[1][k]) for c in comp_cols), inv_c,
             comp_oods_d[k], comp_alphas[k])
            for k in range(num_comp)
        ]
        for g in range(0, len(items), CHUNK):
            chunk = items[g:g + CHUNK]
            acc = exec_chunk(
                acc,
                tuple(it[0] for it in chunk),
                tuple(it[1] for it in chunk),
                tuple(it[2] for it in chunk),
                tuple(it[3] for it in chunk),
            )
        return finish(acc, da, db, x)

    def _deep_lde_fused(self, coeffs: DeepCompositionCoeffs,
                        interpret: bool = False) -> fd.Ext3:
        """Pallas-fused DEEP LDE (ops/deep_pallas.py): one VMEM pass per term
        group instead of one HBM pass per uint32 op.  For base-field AIRs
        (fq == fp, e.g. fib) the whole pipeline stays in Fp — a further 3-9x
        saving over the Ext3-promoted path.

        The whole phase — column/inverse slicing, every term-group kernel,
        degree adjust — is ONE jitted device program (deep_lde_onejit):
        the raw committed matrices and the stacked barycentric inverses go
        in, the DEEP LDE comes out.  Per-column host-side slicing used to
        cost ~300 relay dispatches (~0.6 s warm at brainfuck's 2^14 domain).
        """
        from .ops.deep_pallas import deep_lde_onejit

        trace_pts, point_keys, invs, exec_oods, comp_oods = self._cache
        dom = self.lde_dom
        n = dom.size
        num_base = self.base_lde.num_cols
        fq_is_ext = self.fq_is_ext

        scalar_vals: list[int] = []

        def add_scalar(v) -> int:
            idx = len(scalar_vals)
            if fq_is_ext:
                q = _as_fq3(v)
                scalar_vals.extend([q.c0.v, q.c1.v, q.c2.v])
            else:
                scalar_vals.append(v.v if isinstance(v, Fp) else int(v))
            return idx

        plan = []
        for j, (col, off, _y) in enumerate(trace_pts):
            kind, c = ("b", col) if col < num_base else ("e", col - num_base)
            ood = exec_oods[j] if fq_is_ext else _as_fq3(exec_oods[j]).c0
            plan.append((kind, c, point_keys.index(("t", off)),
                         add_scalar(ood),
                         add_scalar(coeffs.execution_trace[j])))

        comp_is_ext = hasattr(self.composition_lde, "as_ext3")
        inv_c = point_keys.index(("c", 0))
        for k in range(self.composition_lde.num_cols):
            ood = comp_oods[k] if fq_is_ext else _as_fq3(comp_oods[k]).c0
            plan.append(("c", k, inv_c, add_scalar(ood),
                         add_scalar(coeffs.composition_trace[k])))

        degree_vals: list[int] = []
        for v in coeffs.degree:
            if fq_is_ext:
                q = _as_fq3(v)
                degree_vals.extend([q.c0.v, q.c1.v, q.c2.v])
            else:
                degree_vals.append(v.v if isinstance(v, Fp) else int(v))

        plan_key = (type(self.air.config).__qualname__
                    if not isinstance(self.air.config, type)
                    else self.air.config.__qualname__, n, fq_is_ext)
        m = self.composition_lde
        out = deep_lde_onejit(
            n=n, fq_is_ext=fq_is_ext, comp_is_ext=comp_is_ext,
            plan=tuple(plan), npts=len(point_keys),
            base=(self.base_lde.lo, self.base_lde.hi),
            ext=(self.extension_lde.as_ext3()
                 if self.extension_lde is not None else ()),
            comp=(m.as_ext3() if comp_is_ext else (m.lo, m.hi)),
            invs=invs, scalar_vals=scalar_vals, degree_vals=degree_vals,
            x=dom.elements_device(), plan_key=plan_key, interpret=interpret)
        if fq_is_ext:
            return out
        zeros = jnp.zeros_like(out[0])
        return (out, (zeros, zeros), (zeros, zeros))


def _as_fq3(v) -> Fq3:
    return v if isinstance(v, Fq3) else Fq3.from_base(v)
