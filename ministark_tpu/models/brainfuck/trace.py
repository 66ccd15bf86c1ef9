"""BrainfuckTrace: base matrix assembly + extension columns
(reference: examples/brainfuck/trace.rs).

The reference builds the 9 extension columns with sequential per-row loops of
running products/evaluation sums (:108-289).  Every one of them is an affine
recurrence s' = a*s + b with per-row (a, b) computable elementwise from the
base columns, so here they are jitted device affine scans (scan.py).

Permutation initials: the reference draws them from `ark_std::test_rng()`
(trace.rs:82-84) — a fixed, deterministic ChaCha12 stream replicated
byte-exactly by ``ministark_tpu.ark_rng``, so brainfuck proofs are
bit-compatible with the Rust prover.  Set MINISTARK_TPU_BF_INITIALS=fixed
to use the previous fixed public constants instead (either choice is sound:
the cross-table terminal constraints compare running products seeded with
the SAME initial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...fields import device as fd
from ...fields.scalar import Fq3, P
from ...matrix import Matrix, MatrixExt3
from ...scan import affine_scan_ext3
from ...stark import Trace
from . import tables as T
from .vm import OP_READ, OP_WRITE

@functools.lru_cache(maxsize=4)
def _perm_initials_for(mode: str | None) -> tuple[Fq3, Fq3]:
    if mode == "fixed":
        return (
            Fq3(0x6D696E69737461726B % P, 0x747075_1,
                0x696E7374725F696E6974 % P),
            Fq3(0x6D656D5F696E6974 % P, 0x747075_2, 0x6272665F6D656D % P),
        )
    from ...ark_rng import rand_fq3, test_rng

    rng = test_rng()
    return rand_fq3(rng), rand_fq3(rng)


def _perm_initials() -> tuple[Fq3, Fq3]:
    """(instr_initial, mem_initial), matching the reference's two
    ``Fq3::rand(ark_std::test_rng())`` draws (trace.rs:82-84).  Evaluated
    LAZILY (per trace build) so MINISTARK_TPU_BF_INITIALS set after import
    still takes effect."""
    import os

    return _perm_initials_for(os.environ.get("MINISTARK_TPU_BF_INITIALS"))


def __getattr__(name):
    # module-level INSTR_PERM_INITIAL / MEM_PERM_INITIAL stay importable
    # (tests/test_ark_rng.py) but re-read the env toggle on each access
    if name == "INSTR_PERM_INITIAL":
        return _perm_initials()[0]
    if name == "MEM_PERM_INITIAL":
        return _perm_initials()[1]
    raise AttributeError(name)


class BrainfuckTrace(Trace):
    def __init__(self, tables: dict, meta=None):
        self.tables = tables
        n = tables["processor"].shape[0]
        cols = np.zeros((T.NUM_BASE_COLUMNS, n), dtype=np.uint64)
        cols[T.PROC_CYCLE:T.PROC_DUMMY + 1] = tables["processor"].T
        cols[T.MEM_CYCLE:T.MEM_DUMMY + 1] = tables["memory"].T
        cols[T.INSTR_IP:T.INSTR_NEXT_INSTR + 1] = tables["instruction"].T
        cols[T.INPUT_VALUE] = tables["input"].T[0]
        cols[T.OUTPUT_VALUE] = tables["output"].T[0]
        self.base = Matrix.from_columns_np(cols)

    def base_columns(self) -> Matrix:
        return self.base

    def build_extension_columns(self, challenges) -> MatrixExt3:
        # ONE stacked scalar upload (challenges + the two permutation
        # initials): per-scalar 0-d uploads cost a relay round-trip each
        # (docs/RESULTS.md); the jitted builder slices limbs back out free.
        vals = [Fq3.from_base(c) for c in challenges] + list(_perm_initials())
        flat = np.array([x for v in vals for x in (v.c0.v, v.c1.v, v.c2.v)],
                        dtype=np.uint64)
        s_lo = jnp.asarray((flat & 0xFFFFFFFF).astype(np.uint32))
        s_hi = jnp.asarray((flat >> 32).astype(np.uint32))

        # whole limb matrix in, stacked planes out: column slicing and the
        # final stacks are traced (eager per-column slices cost a relay
        # dispatch each — 40 of them for the 17 base / 9 ext columns)
        planes = _build_extension_columns(
            (self.base.lo, self.base.hi), s_lo, s_hi)
        return MatrixExt3(*planes)


@jax.jit
def _build_extension_columns(base_mat, s_lo, s_hi):
    """Returns the 9 extension columns as three stacked (9, n) limb-pair
    planes, global column order 17..25.  ``s_lo``/``s_hi`` stack the
    challenge scalars followed by the instruction/memory permutation
    initials (3 limbs each)."""
    base_cols = tuple((base_mat[0][i], base_mat[1][i])
                      for i in range(base_mat[0].shape[0]))
    nch = s_lo.shape[0] // 3 - 2

    def scal(i):
        return tuple((s_lo[3 * i + k], s_hi[3 * i + k]) for k in range(3))

    ch = [scal(i) for i in range(nch)]
    instr_init = scal(nch)
    mem_init = scal(nch + 1)
    n = base_cols[0][0].shape[-1]

    def bc(e):  # broadcast Ext3 scalar to (n,)
        return tuple((jnp.broadcast_to(c[0], (n,)), jnp.broadcast_to(c[1], (n,))) for c in e)

    def chal(i):
        return bc(ch[i])

    ones = fd.ext3_full((n,), 1, 0, 0)
    zeros = fd.ext3_zeros((n,))

    def lincomb3(c0_ch, x0, c1_ch, x1, c2_ch, x2):
        return fd.ext3_add(
            fd.ext3_add(fd.ext3_mul_base(chal(c0_ch), x0),
                        fd.ext3_mul_base(chal(c1_ch), x1)),
            fd.ext3_mul_base(chal(c2_ch), x2))

    def sel(mask, a, b):
        return fd.ext3_select(mask, a, b)

    def nonzero(x):
        return (x[0] | x[1]) != 0

    def is_op(x, op):
        return (x[0] == np.uint32(op)) & (x[1] == 0)

    def roll_fp(x, shift):
        return (jnp.roll(x[0], shift), jnp.roll(x[1], shift))

    proc_cycle = base_cols[T.PROC_CYCLE]
    proc_ip = base_cols[T.PROC_IP]
    proc_curr = base_cols[T.PROC_CURR_INSTR]
    proc_next = base_cols[T.PROC_NEXT_INSTR]
    proc_mp = base_cols[T.PROC_MP]
    proc_mv = base_cols[T.PROC_MEM_VAL]

    # -- processor: instruction permutation (exclusive) ----------------------
    instr_factor = fd.ext3_sub(
        bc(ch[T.CH_ALPHA]),
        lincomb3(T.CH_A, proc_ip, T.CH_B, proc_curr, T.CH_C, proc_next))
    cond = nonzero(proc_curr)
    a = sel(cond, instr_factor, ones)
    proc_instr_perm = affine_scan_ext3(a, zeros, instr_init, inclusive=False)

    # -- processor: memory permutation (exclusive) ----------------------------
    mem_factor_proc = fd.ext3_sub(
        bc(ch[T.CH_BETA]),
        lincomb3(T.CH_D, proc_cycle, T.CH_E, proc_mp, T.CH_F, proc_mv))
    a = sel(cond, mem_factor_proc, ones)
    proc_mem_perm = affine_scan_ext3(a, zeros, mem_init, inclusive=False)

    # -- processor: input / output running evaluations (exclusive) ------------
    next_mv = roll_fp(proc_mv, -1)
    read_mask = is_op(proc_curr, OP_READ)
    a = sel(read_mask, bc(ch[T.CH_GAMMA]), ones)
    b = sel(read_mask, fd.ext3_from_base(next_mv), zeros)
    proc_input_eval = affine_scan_ext3(a, b, _zero_scalar(), inclusive=False)

    write_mask = is_op(proc_curr, OP_WRITE)
    a = sel(write_mask, bc(ch[T.CH_DELTA]), ones)
    b = sel(write_mask, fd.ext3_from_base(next_mv), zeros)
    proc_output_eval = affine_scan_ext3(a, b, _zero_scalar(), inclusive=False)

    # -- memory: permutation (exclusive) --------------------------------------
    mem_cycle = base_cols[T.MEM_CYCLE]
    mem_mp = base_cols[T.MEM_MP]
    mem_mv = base_cols[T.MEM_MEM_VAL]
    mem_dummy = base_cols[T.MEM_DUMMY]
    mem_factor = fd.ext3_sub(
        bc(ch[T.CH_BETA]),
        lincomb3(T.CH_D, mem_cycle, T.CH_E, mem_mp, T.CH_F, mem_mv))
    a = sel(~nonzero(mem_dummy), mem_factor, ones)
    mem_perm = affine_scan_ext3(a, zeros, mem_init, inclusive=False)

    # -- instruction: processor permutation (inclusive) -----------------------
    ins_ip = base_cols[T.INSTR_IP]
    ins_curr = base_cols[T.INSTR_CURR_INSTR]
    ins_next = base_cols[T.INSTR_NEXT_INSTR]
    prev_ip = roll_fp(ins_ip, 1)
    idx = jnp.arange(n)
    same_ip = (ins_ip[0] == prev_ip[0]) & (ins_ip[1] == prev_ip[1]) & (idx > 0)
    cond = nonzero(ins_curr) & same_ip
    ins_factor = fd.ext3_sub(
        bc(ch[T.CH_ALPHA]),
        lincomb3(T.CH_A, ins_ip, T.CH_B, ins_curr, T.CH_C, ins_next))
    a = sel(cond, ins_factor, ones)
    instr_proc_perm = affine_scan_ext3(a, zeros, instr_init, inclusive=True)

    # -- instruction: program evaluation (inclusive) ---------------------------
    addr_changed = ~same_ip  # row 0: previous_address = -1 -> always changes
    b_val = lincomb3(T.CH_A, ins_ip, T.CH_B, ins_curr, T.CH_C, ins_next)
    a = sel(addr_changed, bc(ch[T.CH_ETA]), ones)
    b = sel(addr_changed, b_val, zeros)
    instr_prog_eval = affine_scan_ext3(a, b, _zero_scalar(), inclusive=True)

    # -- input / output tables (inclusive) -------------------------------------
    in_val = base_cols[T.INPUT_VALUE]
    a = bc(ch[T.CH_GAMMA])
    input_eval = affine_scan_ext3(
        a, fd.ext3_from_base(in_val), _zero_scalar(), inclusive=True)

    out_val = base_cols[T.OUTPUT_VALUE]
    a = bc(ch[T.CH_DELTA])
    output_eval = affine_scan_ext3(
        a, fd.ext3_from_base(out_val), _zero_scalar(), inclusive=True)

    ext_cols = [
        proc_instr_perm, proc_mem_perm, proc_input_eval, proc_output_eval,
        mem_perm, instr_proc_perm, instr_prog_eval, input_eval, output_eval,
    ]
    # stacked (9, n) limb planes per Ext3 component (traced: free)
    return tuple(
        (jnp.stack([c[k][0] for c in ext_cols]),
         jnp.stack([c[k][1] for c in ext_cols]))
        for k in range(3))


def _zero_scalar() -> fd.Ext3:
    z = jnp.asarray(np.uint32(0))
    return ((z, z), (z, z), (z, z))
