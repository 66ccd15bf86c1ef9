"""End-to-end fib AIR: prove + verify roundtrip, proof serialization,
tamper rejection (the cross-backend test class the reference lacks,
SURVEY.md §4 gaps)."""

import pytest

from ministark_tpu.air import ProofOptions
from ministark_tpu.fields import Fp
from ministark_tpu.models.fib import FibClaim, gen_trace
from ministark_tpu.proof import Proof
from ministark_tpu.verifier import VerificationError


OPTIONS = ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=4,
                       fri_folding_factor=4, fri_max_remainder_coeffs=4)


@pytest.fixture(scope="module")
def proof_and_claim():
    trace = gen_trace(128)
    claim = FibClaim(trace.last_value())
    proof = claim.prove(OPTIONS, trace)
    return proof, claim


def test_prove_verify_roundtrip(proof_and_claim):
    proof, claim = proof_and_claim
    artifacts = claim.verify(proof, 10)
    assert len(artifacts.query_positions) <= OPTIONS.num_queries


def test_proof_serialization_roundtrip(proof_and_claim):
    proof, claim = proof_and_claim
    data = proof.to_bytes(Fp)
    back = Proof.from_bytes(data, Fp, Fp)
    assert back.to_bytes(Fp) == data
    claim.verify(back, 10)


def test_security_gate(proof_and_claim):
    proof, claim = proof_and_claim
    with pytest.raises(VerificationError, match="security"):
        claim.verify(proof, 100)


def test_wrong_claim_rejected(proof_and_claim):
    proof, _ = proof_and_claim
    bad_claim = FibClaim(Fp(12345))
    with pytest.raises(VerificationError):
        bad_claim.verify(proof, 10)


def test_tampered_ood_rejected(proof_and_claim):
    proof, claim = proof_and_claim
    data = bytearray(proof.to_bytes(Fp))
    bad = Proof.from_bytes(bytes(data), Fp, Fp)
    bad.execution_trace_ood_evals[0] = bad.execution_trace_ood_evals[0] + Fp(1)
    with pytest.raises(VerificationError):
        claim.verify(bad, 10)


def test_tampered_query_value_rejected(proof_and_claim):
    proof, claim = proof_and_claim
    bad = Proof.from_bytes(proof.to_bytes(Fp), Fp, Fp)
    bad.trace_queries.base_trace_values[0] = (
        bad.trace_queries.base_trace_values[0] + Fp(1))
    with pytest.raises(VerificationError):
        claim.verify(bad, 10)


def test_tampered_pow_rejected(proof_and_claim):
    proof, claim = proof_and_claim
    bad = Proof.from_bytes(proof.to_bytes(Fp), Fp, Fp)
    bad.pow_nonce ^= 1
    with pytest.raises(VerificationError):
        claim.verify(bad, 10)


def test_validate_constraints_passes():
    from ministark_tpu.air import Air, Challenges, Hints
    from ministark_tpu import debug
    trace = gen_trace(128)
    claim = FibClaim(trace.last_value())
    air = claim.build_air(16, OPTIONS)
    hints = air.gen_hints(Challenges())
    debug.validate_constraints(air, Challenges(), hints, trace.base_columns(), None)


def test_validate_constraints_catches_bad_trace():
    from ministark_tpu.air import Challenges
    from ministark_tpu import debug
    from ministark_tpu.matrix import Matrix
    import numpy as np
    trace = gen_trace(128)
    claim = FibClaim(trace.last_value())
    air = claim.build_air(16, OPTIONS)
    hints = air.gen_hints(Challenges())
    vals = trace.base_columns().to_ints()
    vals[3, 7] ^= 1  # corrupt one cell
    bad = Matrix.from_columns_np(vals)
    with pytest.raises(debug.ConstraintViolation):
        debug.validate_constraints(air, Challenges(), hints, bad, None)
