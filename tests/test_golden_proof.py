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

import pytest

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


def _check_golden(path: str, data: bytes):
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        raise AssertionError(
            f"golden fixture was missing — wrote {path} "
            f"(sha256={hashlib.sha256(data).hexdigest()[:16]}); "
            "commit it and re-run")
    with open(path, "rb") as f:
        golden = f.read()
    assert data == golden, (
        "proof bytes changed vs the golden fixture — transcript or "
        "serialization compatibility break "
        f"(got sha256={hashlib.sha256(data).hexdigest()[:16]}, "
        f"want {hashlib.sha256(golden).hexdigest()[:16]})")


@pytest.mark.slow
def test_proof_bytes_match_golden_fixture():
    _check_golden(FIXTURE, _prove_bytes())


@pytest.mark.slow
def test_brainfuck_proof_bytes_match_golden_fixture():
    """Pins the Fq3/extension-column/permutation-argument transcript."""
    from ministark_tpu.fields.scalar import Fq3
    from ministark_tpu.models.brainfuck import (BrainfuckClaim,
                                                BrainfuckTrace, simulate)

    tables, out = simulate("++>+++[<+>-]<.")
    trace = BrainfuckTrace(tables)
    claim = BrainfuckClaim("++>+++[<+>-]<.", b"", out)
    opts = ProofOptions(num_queries=9, lde_blowup_factor=16,
                        grinding_factor=0, fri_folding_factor=4,
                        fri_max_remainder_coeffs=16)
    data = claim.prove(opts, trace).to_bytes(Fq3)
    _check_golden(os.path.join(os.path.dirname(__file__), "golden",
                               "brainfuck_2plus3.proof"), data)
