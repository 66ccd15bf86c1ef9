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

import jax.numpy as jnp

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


def _bcast_scalar(v: Fq3, n: int) -> fd.Ext3:
    return tuple(fd.full((n,), c.v) for c in (v.c0, v.c1, v.c2))


def _tree_sum_ext3(a: fd.Ext3) -> fd.Ext3:
    return tuple(_tree_sum_fp(c) for c in a)


def _sub_scalar_from_x(x_lde: fd.Fp2, y: Fq3) -> fd.Ext3:
    """(x_i - y) with x_i base-field points, y an Fq3 scalar."""
    n = x_lde[0].shape[-1]
    yb = _bcast_scalar(y, n)
    x_e = fd.ext3_from_base(x_lde)
    return fd.ext3_sub(x_e, yb)


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

    def _distinct_points(self):
        """All distinct OOD points: trace-argument points + z^m."""
        pts = {}
        for (col, off, y) in self._trace_points():
            pts.setdefault(("t", off), y)
        m = self.composition_lde.num_cols
        pts[("c", 0)] = self._zq() ** m
        return pts

    # -- barycentric machinery -------------------------------------------------

    def _bary_weights(self, y: Fq3):
        """inv(y - x_i) over the LDE domain, and the scalar prefactor
        (y^N - o^N) / (N * o^(N-1))."""
        dom = self.lde_dom
        x = dom.elements_device()
        diff = fd.ext3_sub(_bcast_scalar(y, dom.size), fd.ext3_from_base(x))
        inv = fd.ext3_batch_inv(diff)
        scale = (y ** dom.size - Fp(dom.offset_pow_size())) / (
            Fp(dom.size) * Fp(pow(dom.offset, dom.size - 1, P)))
        return inv, scale

    def _eval_columns_at(self, cols_ext3: fd.Ext3, inv_vec: fd.Ext3, scale: Fq3):
        """Barycentric evaluation of (ncols, N) Ext3 column evals at one OOD
        point; returns list of scalar Fq3."""
        dom = self.lde_dom
        gpow = powers(dom.group_gen, dom.size)  # g^i table (cached)
        ncols = cols_ext3[0][0].shape[0]
        n = dom.size
        w = fd.ext3_mul_base(inv_vec, gpow)  # shared weights
        wb = tuple((jnp.broadcast_to(c[0], (ncols, n)),
                    jnp.broadcast_to(c[1], (ncols, n))) for c in w)
        prods = fd.ext3_mul(cols_ext3, wb)
        sums = _tree_sum_ext3(prods)  # (ncols,) scalars per component
        out = []
        for i in range(ncols):
            v = Fq3(*[int(c[0][i]) | (int(c[1][i]) << 32) for c in sums])
            out.append(v * scale)
        return out

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
        trace_pts = self._trace_points()
        distinct = self._distinct_points()

        bary = {}
        for key, y in distinct.items():
            bary[key] = self._bary_weights(y)

        base_cols = self._base_as_ext3()
        ext_cols = self.extension_lde.as_ext3() if self.extension_lde is not None else None
        comp_cols = self._comp_as_ext3()
        num_base = self.base_lde.num_cols

        # evaluate every trace column at every distinct trace offset point
        col_evals = {}  # ("t", off) -> list over all columns
        for (kind, off), (inv_vec, scale) in bary.items():
            if kind != "t":
                continue
            evals = self._eval_columns_at(base_cols, inv_vec, scale)
            if ext_cols is not None:
                evals += self._eval_columns_at(ext_cols, inv_vec, scale)
            col_evals[("t", off)] = evals

        execution_oods = []
        for (col, off, y) in trace_pts:
            execution_oods.append(col_evals[("t", off)][col])

        inv_vec, scale = bary[("c", 0)]
        composition_oods = self._eval_columns_at(comp_cols, inv_vec, scale)

        self._cache = (trace_pts, distinct, bary, execution_oods, composition_oods)
        if not self.fq_is_ext:
            return ([self._demote(v) for v in execution_oods],
                    [self._demote(v) for v in composition_oods])
        return execution_oods, composition_oods

    def _demote(self, v: Fq3):
        assert v.c1.is_zero() and v.c2.is_zero(), "OOD eval not in base field"
        return v.c0

    # -- DEEP LDE (replaces into_deep_poly + its re-evaluation) ----------------

    def deep_lde(self, coeffs: DeepCompositionCoeffs) -> fd.Ext3:
        """The DEEP composition evaluated over the LDE domain, natural order
        (what FRI consumes)."""
        assert self._cache is not None, "call get_ood_evals first"
        trace_pts, distinct, bary, exec_oods, comp_oods = self._cache
        dom = self.lde_dom
        n = dom.size

        base_cols = self._base_as_ext3()
        ext_cols = self.extension_lde.as_ext3() if self.extension_lde is not None else None
        comp_cols = self._comp_as_ext3()
        num_base = self.base_lde.num_cols

        # reuse (y - x_i) inverses: deep needs inv(x_i - y) = -inv(y - x_i)
        acc = fd.ext3_zeros((n,))
        for j, ((col, off, y), ood) in enumerate(zip(trace_pts, exec_oods)):
            inv_vec, _ = bary[("t", off)]
            inv_x_minus_y = fd.ext3_neg(inv_vec)
            if col < num_base:
                col_vals = tuple((c[0][col], c[1][col]) for c in base_cols)
            else:
                col_vals = tuple((c[0][col - num_base], c[1][col - num_base])
                                 for c in ext_cols)
            alpha = scalar_to_ext3(coeffs.execution_trace[j])
            diff = fd.ext3_sub(col_vals, _bcast_scalar(scalar_to_ext3(_as_fq3(ood)), n))
            term = fd.ext3_mul(diff, inv_x_minus_y)
            acc = fd.ext3_add(acc, fd.ext3_mul(term, _bcast_scalar(alpha, n)))

        inv_vec, _ = bary[("c", 0)]
        inv_x_minus_zm = fd.ext3_neg(inv_vec)
        for k in range(self.composition_lde.num_cols):
            col_vals = tuple((c[0][k], c[1][k]) for c in comp_cols)
            alpha = scalar_to_ext3(coeffs.composition_trace[k])
            diff = fd.ext3_sub(col_vals, _bcast_scalar(_as_fq3(comp_oods[k]), n))
            term = fd.ext3_mul(diff, inv_x_minus_zm)
            acc = fd.ext3_add(acc, fd.ext3_mul(term, _bcast_scalar(alpha, n)))

        # degree adjust: * (alpha + beta*x)
        da, db = coeffs.degree
        da = scalar_to_ext3(da)
        db = scalar_to_ext3(db)
        x = dom.elements_device()
        adj = fd.ext3_add(_bcast_scalar(da, n),
                          fd.ext3_mul_base(_bcast_scalar(db, n), x))
        return fd.ext3_mul(acc, adj)


def _as_fq3(v) -> Fq3:
    return v if isinstance(v, Fq3) else Fq3.from_base(v)
