"""Golden proof-byte regression tests.

The proof byte stream is a compatibility surface (ark-serialize layouts +
byte-exact Fiat-Shamir); any unintended change to the transcript, field
serialization, Merkle ordering, FRI schedule, or query sampling shows up
here as a byte diff.  SURVEY.md §4 calls bit-stable proofs the rebuild's
central test; the Rust reference isn't runnable in this environment, so the
fixture pins OUR bytes (generated once, committed) against regressions.
"""

import hashlib
import os

from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fp
from ministark_tpu.models.fib import FibClaim, gen_trace

FIXTURE = os.path.join(os.path.dirname(__file__), "golden", "fib_2e10.proof")

OPTS = ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=2,
                    fri_folding_factor=4, fri_max_remainder_coeffs=16)


def _prove_bytes() -> bytes:
    trace = gen_trace(1 << 10)
    claim = FibClaim(trace.last_value())
    return claim.prove(OPTS, trace).to_bytes(Fp)


def test_proof_bytes_match_golden_fixture():
    data = _prove_bytes()
    if not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "wb") as f:
            f.write(data)
        raise AssertionError(
            f"golden fixture was missing — wrote {FIXTURE} "
            f"(sha256={hashlib.sha256(data).hexdigest()[:16]}); "
            "commit it and re-run")
    with open(FIXTURE, "rb") as f:
        golden = f.read()
    assert data == golden, (
        "proof bytes changed vs the golden fixture — transcript or "
        "serialization compatibility break "
        f"(got sha256={hashlib.sha256(data).hexdigest()[:16]}, "
        f"want {hashlib.sha256(golden).hexdigest()[:16]})")
