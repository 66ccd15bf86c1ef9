"""The proving pipeline (reference: src/prover.rs `default_prove`, call stack
in SURVEY.md §3.1), reorganized for TPU:

* every matrix stays in NATURAL domain order on device; bit-reversed order
  exists only at Merkle commitment (digest permutation) and query time — the
  reference's in-place bit-reverse juggling (src/prover.rs:81-91,183-194)
  becomes a strided slice: natural CE value j == lde[j * (lde_n / ce_n)];
* host<->device traffic happens only at Fiat-Shamir boundaries (roots, OOD
  scalars, the PoW seed) — everything else is jitted device work.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from . import merkle
from .air import Air, Challenges, ProofOptions
from .channel import ProverChannel
from .composer import DeepPolyComposer
from .eval import eval_composition
from .fields import device as fd
from .fields.scalar import Fp, Fq3
from .fri import FriOptions, FriProver
from .matrix import Matrix, MatrixExt3
from .ntt import bit_reverse_index
from .ops import pow as dpow
from .proof import Proof, Queries
from .utils.timer import Timer


class ProvingError(Exception):
    pass


_COMP_COMMIT_PROGRAMS: dict = {}


def _comp_commit_program(trace_len: int, cb: int, ce_dom, lde_dom,
                         fq_is_ext: bool, interpret: bool):
    """Cached jitted program for the whole composition-commit phase:
    CE-domain iNTT, split into cb interleaved columns, coset NTT to the LDE
    domain, row hash, and every Merkle level — one device dispatch."""
    key = (trace_len, cb, ce_dom.size, ce_dom.offset, lde_dom.size,
           lde_dom.offset, fq_is_ext, interpret)
    if key not in _COMP_COMMIT_PROGRAMS:
        def prog(evals, itbl, iunscale, itmat, ipost, ftbl, fscale, ftmat,
                 fbrv):
            if fq_is_ext:
                coeffs = ce_dom._ifft_ext3_impl(evals, itbl, iunscale, itmat,
                                                ipost)
                polys = tuple(
                    (c[0].reshape(trace_len, cb).T,
                     c[1].reshape(trace_len, cb).T) for c in coeffs)
                lde = lde_dom._fft_ext3_impl(polys, ftbl, fscale, ftmat, fbrv)
                levels = merkle.commit_matrix_ext3_traced(
                    lde[0], lde[1], lde[2], True, interpret)
            else:
                coeffs = ce_dom._ifft_fp_impl(evals, itbl, iunscale, itmat,
                                              ipost)
                polys = (coeffs[0].reshape(trace_len, cb).T,
                         coeffs[1].reshape(trace_len, cb).T)
                lde = lde_dom._fft_fp_impl(polys, ftbl, fscale, ftmat, fbrv)
                levels = merkle.commit_matrix_fp_traced(
                    lde[0], lde[1], True, interpret)
            return lde, levels

        _COMP_COMMIT_PROGRAMS[key] = jax.jit(prog)
    return _COMP_COMMIT_PROGRAMS[key]


def default_prove(stark, options: ProofOptions, witness, validate: bool = False) -> Proof:
    from .utils.timer import stop_trace

    try:
        return _default_prove(stark, options, witness, validate)
    finally:
        stop_trace()  # no-op unless MINISTARK_TPU_PROFILE is set


def _default_prove(stark, options: ProofOptions, witness, validate: bool) -> Proof:
    fq_is_ext = stark.fq is Fq3
    from . import hash as H
    hashfn = getattr(stark, "merkle_hash", H)  # MerkleTree assoc type analogue

    with Timer("Trace generation"):
        trace = stark.generate_trace(witness)
        base_trace = trace.base_columns()

    with Timer("Air init"):
        air = stark.build_air(base_trace.num_rows, options)
        channel = ProverChannel(air, stark.gen_public_coin(air))

    trace_dom = air.trace_domain()
    lde_dom = air.lde_domain()

    # Hand-scheduled multi-chip executor (parallel/executor.py): when the
    # proving Stark carries one, the hot LDE+commit phases run as shard_map
    # programs with Pallas kernels on local shards instead of the GSPMD
    # auto-partitioned XLA paths.
    executor = getattr(stark, "sharded_executor", None)
    use_ex_commit = (executor is not None and hashfn is H
                     and executor.commit_supported(lde_dom.size))

    # -- phase 1: base trace commit (src/prover.rs:45-55) --------------------
    with Timer("Base trace commitment"):
        assert air.config.NUM_BASE_COLUMNS == base_trace.num_cols
        base_polys = None
        if use_ex_commit:
            base_lde, base_tree = executor.lde_commit_fp(
                base_trace, trace_dom, lde_dom)
        else:
            base_polys = base_trace.interpolate(trace_dom)
            base_lde = base_polys.evaluate(lde_dom)  # natural order
            base_tree = merkle.commit_matrix_fp(base_lde.lo, base_lde.hi,
                                                hashfn=hashfn)
    channel.commit_base_trace(base_tree.root())

    challenges = Challenges(channel.public_coin.draw_multiple(air.num_challenges()))
    hints = air.gen_hints(challenges)

    # -- phase 2: extension trace commit (src/prover.rs:60-72) ---------------
    with Timer("Extension trace commitment"):
        ext_trace = trace.build_extension_columns(challenges)
        num_ext = ext_trace.num_cols if ext_trace is not None else 0
        assert getattr(air.config, "NUM_EXTENSION_COLUMNS", 0) == num_ext
        ext_polys = ext_lde = ext_tree = None
        if ext_trace is not None:
            if use_ex_commit:
                ext_lde, ext_tree = executor.lde_commit_ext3(
                    ext_trace, trace_dom, lde_dom)
            else:
                ext_polys = ext_trace.interpolate(trace_dom)
                ext_lde = ext_polys.evaluate(lde_dom)
                e = ext_lde.as_ext3()
                ext_tree = merkle.commit_matrix_ext3(e[0], e[1], e[2],
                                                     hashfn=hashfn)
            channel.commit_extension_trace(ext_tree.root())

    if validate:
        stark.validate_constraints(air, challenges, hints, base_trace, ext_trace)

    # -- phase 3: composition trace (src/prover.rs:78-131) -------------------
    with Timer("Constraint evaluation"):
        ce_dom = air.ce_domain()
        r = lde_dom.size // ce_dom.size
        x_lde = ce_dom.elements_device()
        # CE-domain trace values: natural CE value j == lde[j*r], but a
        # stride-r lane slice costs ~30x a dense pass on this chip (697 ms
        # of the 822 ms phase at 2^24 values, docs/RESULTS.md).  When the
        # coefficients are at hand, ONE batched CE-domain NTT (~50 ms)
        # produces the identical field elements instead.
        if r == 1:
            base_ce = base_lde
        elif base_polys is not None:
            base_ce = base_polys.evaluate(ce_dom)
        else:  # executor path: coefficients were never materialized
            base_ce = Matrix(base_lde.lo[:, ::r], base_lde.hi[:, ::r])
        # whole limb matrices, NOT per-column slices: eval's jitted programs
        # slice columns inside the trace (eager slices cost a relay dispatch
        # each — ~90 of them for brainfuck's 17+9 columns)
        base_ce_cols = (base_ce.lo, base_ce.hi)
        ext_ce_cols = None
        if ext_lde is not None:
            if r == 1:
                ext_ce = ext_lde
            elif ext_polys is not None:
                ext_ce = ext_polys.evaluate(ce_dom)
            else:
                e = ext_lde.as_ext3()
                ext_ce = MatrixExt3(*[(c[0][:, ::r], c[1][:, ::r])
                                      for c in e])
            ext_ce_cols = ext_ce.as_ext3()
        num_coeffs = air.num_composition_constraint_coeffs()
        composition_coeffs = channel.public_coin.draw_multiple(num_coeffs)
        comp_evals = eval_composition(
            air, composition_coeffs, challenges, hints, x_lde,
            base_ce_cols, ext_ce_cols)

    with Timer("Composition trace commitment"):
        cb = air.ce_blowup_factor
        mode = merkle._lanes_mode() if hashfn is merkle.H else None
        if mode is not None:
            # ONE program: iNTT + column split + coset NTT + hash + full tree
            prog = _comp_commit_program(
                air.trace_len, cb, ce_dom, lde_dom, fq_is_ext,
                mode == "interpret")
            lde_arrays, levels = prog(
                comp_evals, ce_dom._inv_tbl(), ce_dom._unscale_tbl(),
                ce_dom._inv_tmat(), ce_dom._ipost_tbl(), lde_dom._fwd_tbl(),
                lde_dom._scale_tbl(), lde_dom._fwd_tmat(),
                lde_dom._scale_brv_tbl())
            comp_lde = (MatrixExt3(*lde_arrays) if fq_is_ext
                        else Matrix(*lde_arrays))
            comp_tree = merkle.CommittedMerkleTree(levels, device_lanes=True,
                                                   bitrev_storage=True)
        elif fq_is_ext:
            coeffs = ce_dom.ifft_ext3(comp_evals)
            # split into cb interleaved columns: col_i[j] = coeffs[j*cb + i]
            comp_polys = MatrixExt3(*[
                (c[0].reshape(air.trace_len, cb).T, c[1].reshape(air.trace_len, cb).T)
                for c in coeffs])
            comp_lde = comp_polys.evaluate(lde_dom)
            ce_ = comp_lde.as_ext3()
            comp_tree = merkle.commit_matrix_ext3(ce_[0], ce_[1], ce_[2],
                                                 hashfn=hashfn)
        else:
            coeffs = ce_dom.ifft_fp(comp_evals)
            comp_polys = Matrix(
                coeffs[0].reshape(air.trace_len, cb).T,
                coeffs[1].reshape(air.trace_len, cb).T)
            comp_lde = comp_polys.evaluate(lde_dom)
            comp_tree = merkle.commit_matrix_fp(comp_lde.lo, comp_lde.hi,
                                                hashfn=hashfn)
        channel.commit_composition_trace(comp_tree.root())

    # -- phase 4: DEEP composition (src/prover.rs:133-149) -------------------
    with Timer("DEEP composition"):
        z = channel.get_ood_point()
        composer = DeepPolyComposer(air, z, base_lde, ext_lde, comp_lde)
        execution_oods, composition_oods = composer.get_ood_evals()
        channel.send_ood_evals(execution_oods, composition_oods)

        deep_coeffs = stark.gen_deep_coeffs(channel.public_coin, air)
        deep_lde = composer.deep_lde(deep_coeffs)  # Ext3 (lde_n,), natural

    # -- phase 5: FRI (src/prover.rs:151-155) --------------------------------
    with Timer("FRI"):
        fri_options = FriOptions(
            folding_factor=options.fri_folding_factor,
            max_remainder_coeffs=options.fri_max_remainder_coeffs,
            blowup_factor=options.lde_blowup_factor)
        fri_prover = FriProver(fri_options, fq_is_ext, hashfn=hashfn,
                               executor=executor)
        fri_prover.build_layers(channel, deep_lde)

    # -- phase 6: PoW + queries (src/prover.rs:157-173) ----------------------
    with Timer("Proof of work"):
        from . import hash_rpo, native
        coin_hash = channel.public_coin.hashfn
        bits = options.grinding_factor
        # Small grinds are cheaper on the HOST than one device round-trip:
        # the native C++ grind runs ~3M hashes/s, so expected work 2^bits
        # stays under the ~90 ms relay dispatch+readback up to bits ~16
        # (the reference grinds on CPU always, src/random.rs:48-57).
        grinder = None
        if coin_hash is H:
            if bits <= 16 and native.get_lib() is not None:
                grinder = native.pow_grind
            else:
                grinder = dpow.grind
        elif coin_hash is hash_rpo:
            grinder = dpow.grind_rpo
        channel.grind_fri_commitments(grinder=grinder)

    query_positions = channel.get_fri_query_positions()
    trees = [base_tree, comp_tree] + ([ext_tree] if ext_tree else [])
    fuse_decommits = (fri_prover.decommit_bundleable()
                      and all(t.device_lanes for t in trees))
    if fuse_decommits:
        # FRI layer rows/nodes AND trace query rows/nodes in ONE device
        # transfer (each fetch_bundle round-trip costs relay latency)
        with Timer("FRI decommit"):
            fri_specs, fri_finish = fri_prover.decommit_plan(query_positions)
            q_specs, q_finish = queries_plan(
                air, base_lde, ext_lde, comp_lde,
                base_tree, ext_tree, comp_tree, query_positions)
            blocks = merkle.fetch_bundle(fri_specs + q_specs)
            fri_proof = fri_finish(blocks[:len(fri_specs)])
        with Timer("Queries"):
            queries = q_finish(blocks[len(fri_specs):])
    else:
        with Timer("FRI decommit"):
            fri_proof = fri_prover.into_proof(query_positions)
        with Timer("Queries"):
            queries = build_queries(
                air, base_lde, ext_lde, comp_lde,
                base_tree, ext_tree, comp_tree, query_positions)

    return Proof(
        options=options,
        trace_len=air.trace_len,
        base_trace_commitment=channel.base_trace_commitment,
        extension_trace_commitment=channel.extension_trace_commitment,
        composition_trace_commitment=channel.composition_trace_commitment,
        fri_proof=fri_proof,
        pow_nonce=channel.pow_nonce,
        trace_queries=queries,
        execution_trace_ood_evals=channel.execution_trace_ood_evals,
        composition_trace_ood_evals=channel.composition_trace_ood_evals,
    )


def build_queries(air, base_lde, ext_lde, comp_lde, base_tree, ext_tree,
                  comp_tree, positions) -> Queries:
    """Decommit trace rows at bit-reversed query positions
    (src/trace.rs:114-157).  On the lanes (TPU) path ALL three matrices'
    rows and all three trees' Merkle nodes come back in ONE device
    round-trip (merkle.fetch_bundle).  Requires EVERY tree device-resident
    (the sharded prover mixes executor-built lanes trees with host-numpy
    GSPMD ones — those decommit per-tree below)."""
    trees = [base_tree, comp_tree] + ([ext_tree] if ext_tree else [])
    if all(t.device_lanes for t in trees):
        return _build_queries_bundled(
            air, base_lde, ext_lde, comp_lde, base_tree, ext_tree,
            comp_tree, positions)
    base_rows = base_lde.get_bit_reversed_rows(positions)
    ext_rows = ext_lde.get_bit_reversed_rows(positions) if ext_lde is not None else None
    comp_rows = comp_lde.get_bit_reversed_rows(positions)
    base_values, ext_values, comp_values = [], [], []
    for i, pos in enumerate(positions):
        base_values.extend(base_rows[i])
        if ext_rows is not None:
            ext_values.extend(ext_rows[i])
        comp_values.extend(comp_rows[i])
    return Queries(
        base_trace_values=base_values,
        extension_trace_values=ext_values,
        composition_trace_values=comp_values,
        base_trace_proof=base_tree.prove(positions),
        extension_trace_proof=ext_tree.prove(positions) if ext_tree else None,
        composition_trace_proof=comp_tree.prove(positions),
    )


def _matrix_planes(m):
    """Limb planes of a Matrix/MatrixExt3 plus a scalar builder."""
    if isinstance(m, MatrixExt3):
        planes = [p for comp in m.c for p in comp]

        def build(comps, c, i):
            return Fq3(int(comps[0][c, i]), int(comps[1][c, i]),
                       int(comps[2][c, i]))
    else:
        planes = [m.lo, m.hi]

        def build(comps, c, i):
            return Fp(int(comps[0][c, i]))
    return planes, build


def _build_queries_bundled(air, base_lde, ext_lde, comp_lde, base_tree,
                           ext_tree, comp_tree, positions) -> Queries:
    from . import merkle as mk

    specs_all, finish = queries_plan(air, base_lde, ext_lde, comp_lde,
                                     base_tree, ext_tree, comp_tree,
                                     positions)
    return finish(mk.fetch_bundle(specs_all))


def queries_plan(air, base_lde, ext_lde, comp_lde, base_tree, ext_tree,
                 comp_tree, positions):
    """(specs, finish) pair for the trace-query decommit, so the prover can
    fuse it with the FRI decommit into one merkle.fetch_bundle transfer."""
    n = base_lde.num_rows
    ridx = [bit_reverse_index(n, p) for p in positions]

    mats = [(base_lde, base_tree)]
    if ext_lde is not None:
        mats.append((ext_lde, ext_tree))
    mats.append((comp_lde, comp_tree))

    specs_all, metas, builders = [], [], []
    for m, tree in mats:
        planes, build = _matrix_planes(m)
        specs_all.append((planes, ridx, 1))
        meta, specs = tree.fetch_plan(positions)
        metas.append((meta, len(specs)))
        specs_all.extend(specs)
        builders.append(build)

    def finish(blocks) -> Queries:
        values, views = [], []
        bi = 0
        for (m, tree), (meta, nspecs), build in zip(mats, metas, builders):
            b = blocks[bi].astype(np.uint64)
            bi += 1
            comps = [b[2 * k] | (b[2 * k + 1] << np.uint64(32))
                     for k in range(b.shape[0] // 2)]
            ncols = comps[0].shape[0]
            values.append([build(comps, c, i)
                           for i in range(len(positions))
                           for c in range(ncols)])
            views.append(tree.view_from(meta, blocks[bi:bi + nspecs]))
            bi += nspecs

        if ext_lde is not None:
            base_values, ext_values, comp_values = values
            base_view, ext_view, comp_view = views
        else:
            base_values, comp_values = values
            base_view, comp_view = views
            ext_values, ext_view = [], None

        return Queries(
            base_trace_values=base_values,
            extension_trace_values=ext_values,
            composition_trace_values=comp_values,
            base_trace_proof=base_view,
            extension_trace_proof=ext_view,
            composition_trace_proof=comp_view,
        )

    return specs_all, finish
