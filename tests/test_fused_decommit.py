"""End-to-end prove on the lanes (TPU) path in interpret mode: device-lanes
Merkle trees for all three trace commitments and every FRI layer, the fused
composition-commit program, and the SINGLE fused decommit transfer
(prover.queries_plan + FriProver.decommit_plan through one
merkle.fetch_bundle) — proof bytes must equal the host/XLA path's.

This is the CPU gate for the combined-decommit branch the real chip takes
(the reference has no analogous cross-backend proof-equality test;
SURVEY.md §4 lists that as a gap the rebuild closes)."""

import pytest

from ministark_tpu.air import ProofOptions
from ministark_tpu.models.fib import FibClaim, gen_trace


def _proof_bytes(claim, proof):
    from ministark_tpu import serde

    w = serde.Writer()
    proof.serialize(w, claim.fq)
    return w.bytes()


@pytest.mark.slow
def test_prove_lanes_interpret_bytes_match(monkeypatch, no_persistent_cache):
    trace = gen_trace(512)
    opts = ProofOptions(num_queries=6, lde_blowup_factor=4,
                        grinding_factor=1, fri_folding_factor=4,
                        fri_max_remainder_coeffs=4)
    claim = FibClaim(trace.last_value())

    p_host = claim.prove(opts, trace)
    claim.verify(p_host, 4)

    monkeypatch.setenv("MINISTARK_TPU_LANES", "interpret")
    p_lanes = claim.prove(opts, trace)
    claim.verify(p_lanes, 4)

    assert _proof_bytes(claim, p_host) == _proof_bytes(claim, p_lanes)
