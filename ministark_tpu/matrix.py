"""Column-major trace matrices on device (reference: src/matrix.rs).

A `Matrix` holds all columns stacked as (ncols, n) uint32 limb arrays —
batched NTTs/hashing treat the column axis as the vmap/batch dimension (the
reference instead keeps a Vec of page-aligned columns for Metal zero-copy;
on TPU a single stacked array is the right layout and shards naturally over
the column axis for multi-chip).

Unlike the reference (which stores LDEs in bit-reversed order and juggles
re-reversals, src/prover.rs:81-91,183-194), matrices here are ALWAYS in
natural domain order; bit-reversal appears only at commitment/query
boundaries (merkle.commit_matrix_*, queries).  The CE-prefix trick becomes a
strided slice: the natural-order CE value j is lde[j * (lde_n // ce_n)].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from .fields import device as fd
from .fields.scalar import Fp, Fq3
from .ntt import Domain, bit_reverse_index

_GATHER_PROGRAMS: dict = {}


def _gather_cols(arrays, idx):
    """Stack column-gathers of (ncols, n) arrays into one jitted program:
    ONE dispatch + ONE transfer instead of one per limb plane."""
    key = (len(arrays), tuple(arrays[0].shape), int(idx.shape[0]))
    if key not in _GATHER_PROGRAMS:
        _GATHER_PROGRAMS[key] = jax.jit(
            lambda arrs, ix: jnp.stack([a[:, ix] for a in arrs]))
    return np.asarray(_GATHER_PROGRAMS[key](arrays, idx), dtype=np.uint64)


class Matrix:
    """Fp matrix: limbs (lo, hi) each (ncols, n)."""

    field = Fp

    def __init__(self, lo, hi):
        assert lo.ndim == 2
        self.lo = lo
        self.hi = hi

    # -- constructors --------------------------------------------------------

    @staticmethod
    def from_columns_np(columns) -> "Matrix":
        """columns: iterable of python-int / uint64 arrays (same length)."""
        arr = np.asarray([np.asarray(c, dtype=np.uint64) for c in columns], dtype=np.uint64)
        lo, hi = fd.pack_np(arr)
        return Matrix(jnp.asarray(lo), jnp.asarray(hi))

    @property
    def num_cols(self) -> int:
        return self.lo.shape[0]

    @property
    def num_rows(self) -> int:
        return self.lo.shape[1]

    def column(self, i: int) -> fd.Fp2:
        return (self.lo[i], self.hi[i])

    def columns(self) -> list:
        return [self.column(i) for i in range(self.num_cols)]

    def as_pair(self) -> fd.Fp2:
        return (self.lo, self.hi)

    # -- transforms ----------------------------------------------------------

    def interpolate(self, domain: Domain) -> "Matrix":
        """Evaluations over `domain` -> coefficients (per-column iNTT)."""
        lo, hi = domain.ifft_fp((self.lo, self.hi))
        return Matrix(lo, hi)

    def evaluate(self, domain: Domain) -> "Matrix":
        """Coefficients -> evaluations over `domain`, natural order."""
        lo, hi = domain.fft_fp((self.lo, self.hi))
        return Matrix(lo, hi)

    def sum_columns(self) -> fd.Fp2:
        acc = self.column(0)
        for i in range(1, self.num_cols):
            acc = fd.add(acc, self.column(i))
        return acc

    # -- host access ---------------------------------------------------------

    def get_row(self, i: int) -> list[Fp]:
        lo = np.asarray(self.lo[:, i], dtype=np.uint64)
        hi = np.asarray(self.hi[:, i], dtype=np.uint64)
        return [Fp(int(l) | (int(h) << 32)) for l, h in zip(lo, hi)]

    def get_bit_reversed_row(self, pos: int) -> list[Fp]:
        """Row `pos` of the bit-reversed ordering of this natural matrix."""
        return self.get_row(bit_reverse_index(self.num_rows, pos))

    def get_bit_reversed_rows(self, positions: list[int]) -> list[list[Fp]]:
        """Bulk variant: ONE device gather + transfer for all query rows."""
        n = self.num_rows
        idx = jnp.asarray(
            np.asarray([bit_reverse_index(n, p) for p in positions], np.int32))
        block = _gather_cols([self.lo, self.hi], idx)
        vals = block[0] | (block[1] << np.uint64(32))
        return [[Fp(int(vals[c, i])) for c in range(self.num_cols)]
                for i in range(len(positions))]

    def to_ints(self) -> np.ndarray:
        return fd.unpack_np((self.lo, self.hi))


class MatrixExt3:
    """Fq3 matrix: three limb pairs, each (ncols, n)."""

    field = Fq3

    def __init__(self, c0, c1, c2):
        self.c = (c0, c1, c2)

    @staticmethod
    def from_columns(columns) -> "MatrixExt3":
        """columns: iterable of lists of scalar Fq3 values."""
        cols = list(columns)
        n = len(cols[0])
        comps = []
        for k in range(3):
            vals = np.asarray(
                [[(getattr(v, f"c{k}").v) for v in col] for col in cols], dtype=np.uint64)
            lo, hi = fd.pack_np(vals)
            comps.append((jnp.asarray(lo), jnp.asarray(hi)))
        return MatrixExt3(*comps)

    @property
    def num_cols(self) -> int:
        return self.c[0][0].shape[0]

    @property
    def num_rows(self) -> int:
        return self.c[0][0].shape[1]

    def column(self, i: int) -> fd.Ext3:
        return tuple((c[0][i], c[1][i]) for c in self.c)

    def columns(self) -> list:
        return [self.column(i) for i in range(self.num_cols)]

    def as_ext3(self) -> fd.Ext3:
        return tuple((c[0], c[1]) for c in self.c)

    def interpolate(self, domain: Domain) -> "MatrixExt3":
        out = domain.ifft_ext3(self.as_ext3())
        return MatrixExt3(*[(c[0], c[1]) for c in out])

    def evaluate(self, domain: Domain) -> "MatrixExt3":
        out = domain.fft_ext3(self.as_ext3())
        return MatrixExt3(*[(c[0], c[1]) for c in out])

    def get_row(self, i: int) -> list[Fq3]:
        out = []
        for col in range(self.num_cols):
            comps = []
            for k in range(3):
                lo = int(self.c[k][0][col, i])
                hi = int(self.c[k][1][col, i])
                comps.append(lo | (hi << 32))
            out.append(Fq3(*comps))
        return out

    def get_bit_reversed_row(self, pos: int) -> list[Fq3]:
        return self.get_row(bit_reverse_index(self.num_rows, pos))

    def get_bit_reversed_rows(self, positions: list[int]) -> list[list[Fq3]]:
        n = self.num_rows
        idx = jnp.asarray(
            np.asarray([bit_reverse_index(n, p) for p in positions], np.int32))
        block = _gather_cols([p for comp in self.c for p in comp], idx)
        comps = [block[2 * k] | (block[2 * k + 1] << np.uint64(32))
                 for k in range(3)]
        return [
            [Fq3(int(comps[0][c, i]), int(comps[1][c, i]), int(comps[2][c, i]))
             for c in range(self.num_cols)]
            for i in range(len(positions))
        ]
