"""Multi-chip prove of the BrainSTARK model (Fq3 extension columns,
permutation/evaluation arguments) on the 8-device CPU mesh: proof bytes
must be identical to the single-chip prover's."""

import pytest

from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fq3
from ministark_tpu.models.brainfuck import BrainfuckClaim, BrainfuckTrace, simulate
from ministark_tpu.parallel import sharded
from ministark_tpu.parallel.prover import prove_sharded

SRC = "++>+++[<+>-]<."


@pytest.mark.slow
def test_sharded_brainfuck_prove_bytes_match():
    tables, out = simulate(SRC)
    trace = BrainfuckTrace(tables)
    claim = BrainfuckClaim(SRC, b"", out)
    opts = ProofOptions(num_queries=9, lde_blowup_factor=16,
                        grinding_factor=0, fri_folding_factor=4,
                        fri_max_remainder_coeffs=16)

    single = claim.prove(opts, trace)
    mesh = sharded.make_mesh(8)
    multi = prove_sharded(claim, opts, trace, mesh)

    assert multi.to_bytes(Fq3) == single.to_bytes(Fq3)
    claim.verify(multi, 30)
