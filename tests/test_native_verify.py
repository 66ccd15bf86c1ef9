"""Native (C++) verifier fast paths vs the pure-Python fallbacks: identical
accept/reject behavior on real, tampered, and cross-checked proofs."""

import pytest

from ministark_tpu import native
from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fp, Fq3, P
from ministark_tpu.models.fib import FibClaim, gen_trace
from ministark_tpu.proof import Proof
from ministark_tpu.verifier import VerificationError

OPTS = ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=0,
                    fri_folding_factor=4, fri_max_remainder_coeffs=4)


@pytest.fixture(scope="module")
def proof_and_claim():
    trace = gen_trace(128)
    claim = FibClaim(trace.last_value())
    return claim.prove(OPTS, trace), claim


def _force_python(monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def test_lib_loads():
    assert native.get_lib() is not None


def test_fq3_mul_inv_match_scalar():
    lib = native.get_lib()
    a = Fq3(12345, 678910, 2**61 + 5)
    b = Fq3(P - 3, 17, 2**40 + 1)
    got = native._fq3_flat([a * b])
    import ctypes
    out = (ctypes.c_uint64 * 3)()
    lib.fq3_mul(native._u64_arr(native._fq3_flat([a])),
                native._u64_arr(native._fq3_flat([b])), out)
    assert list(out) == got
    lib.fq3_inv(native._u64_arr(native._fq3_flat([a])), out)
    inv = a.inverse()
    assert list(out) == [inv.c0.v, inv.c1.v, inv.c2.v]


def test_native_and_python_verify_agree(proof_and_claim, monkeypatch):
    proof, claim = proof_and_claim
    data = proof.to_bytes(Fp)

    claim.verify(Proof.from_bytes(data, Fp, Fp), 8)  # native path

    _force_python(monkeypatch)
    claim.verify(Proof.from_bytes(data, Fp, Fp), 8)  # python fallback


@pytest.mark.parametrize("use_native", [True, False])
def test_tampered_rejected_same_way(proof_and_claim, monkeypatch, use_native):
    proof, claim = proof_and_claim
    data = proof.to_bytes(Fp)
    if not use_native:
        _force_python(monkeypatch)
    else:
        assert native.get_lib() is not None

    # tamper a queried base-trace value -> merkle row check
    bad = Proof.from_bytes(data, Fp, Fp)
    bad.trace_queries.base_trace_values[0] = (
        bad.trace_queries.base_trace_values[0] + Fp(1))
    with pytest.raises(VerificationError):
        claim.verify(bad, 8)

    # tamper a FRI layer row value -> fold consistency / merkle check
    bad = Proof.from_bytes(data, Fp, Fp)
    bad.fri_proof.layers[0].flattened_rows[0] = (
        bad.fri_proof.layers[0].flattened_rows[0] + Fp(1))
    with pytest.raises(VerificationError):
        claim.verify(bad, 8)

    # tamper an OOD composition eval -> DEEP check
    bad = Proof.from_bytes(data, Fp, Fp)
    bad.composition_trace_ood_evals[0] = (
        bad.composition_trace_ood_evals[0] + Fp(1))
    with pytest.raises(VerificationError):
        claim.verify(bad, 8)
