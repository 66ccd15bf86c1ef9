"""End-to-end multi-chip prove (8-device CPU mesh): proof bytes must be
IDENTICAL to the single-chip prover's — the partitioned phase programs
compute the same function, so the whole Fiat-Shamir transcript replays."""

import pytest

from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fp
from ministark_tpu.models.fib import FibClaim, gen_trace
from ministark_tpu.parallel import sharded
from ministark_tpu.parallel.prover import prove_sharded

pytestmark = pytest.mark.slow

OPTIONS = ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=2,
                       fri_folding_factor=4, fri_max_remainder_coeffs=16)


def test_sharded_prove_bytes_match_single_chip():
    trace = gen_trace(1 << 10)
    claim = FibClaim(trace.last_value())

    single = claim.prove(OPTIONS, trace)
    mesh = sharded.make_mesh(8)
    multi = prove_sharded(claim, OPTIONS, trace, mesh)

    assert multi.to_bytes(Fp) == single.to_bytes(Fp)
    claim.verify(multi, 8)
