"""BrainSTARK end-to-end: VM, extension columns, constraint satisfaction,
prove+verify roundtrip, CLI."""

import numpy as np
import pytest

from ministark_tpu import debug
from ministark_tpu.air import Challenges, ProofOptions
from ministark_tpu.fields.scalar import Fp, Fq3
from ministark_tpu.models.brainfuck import (
    BrainfuckClaim,
    BrainfuckTrace,
    compile_program,
    simulate,
)

SRC = "++>+++[<+>-]<."  # computes 2+3 and writes chr(5)


@pytest.fixture(scope="module")
def sim():
    tables, out = simulate(SRC)
    return tables, out


def test_vm_output(sim):
    tables, out = sim
    assert out == bytes([5])
    n = tables["processor"].shape[0]
    assert n & (n - 1) == 0
    assert tables["memory"].shape[0] == n


def test_compile_loop_targets():
    prog = compile_program("[-]")
    # '[' jump-target ']' jump-target
    assert prog[0] == ord("[") and prog[3] == ord("]")
    assert prog[1] == len(prog)  # past the loop
    assert prog[4] == 2          # back to loop body


def test_constraints_satisfied(sim):
    tables, out = sim
    trace = BrainfuckTrace(tables)
    claim = BrainfuckClaim(SRC, b"", out)
    opts = ProofOptions(2, 16, 0, 4, 16)
    air = claim.build_air(tables["processor"].shape[0], opts)
    rng = np.random.default_rng(5)
    challenges = Challenges(
        [Fq3(*[int(v) for v in rng.integers(1, 2**61, 3)]) for _ in range(11)])
    ext = trace.build_extension_columns(challenges)
    hints = air.gen_hints(challenges)
    debug.validate_constraints(air, challenges, hints, trace.base_columns(), ext)


@pytest.mark.slow
def test_prove_verify_roundtrip(sim, tmp_path):
    tables, out = sim
    trace = BrainfuckTrace(tables)
    claim = BrainfuckClaim(SRC, b"", out)
    opts = ProofOptions(num_queries=9, lde_blowup_factor=16, grinding_factor=0,
                        fri_folding_factor=4, fri_max_remainder_coeffs=16)
    proof = claim.prove(opts, trace)
    claim.verify(proof, 30)

    # byte roundtrip through the CLI's (claim, proof) container
    from ministark_tpu import serde
    from ministark_tpu.models.brainfuck import cli
    from ministark_tpu.proof import Proof
    w = serde.Writer()
    cli.serialize_claim(w, claim)
    proof.serialize(w, Fq3)
    data = w.bytes()
    r = serde.Reader(data)
    claim2 = cli.deserialize_claim(r)
    proof2 = Proof.deserialize(r, Fp, Fq3)
    assert claim2.source_code == SRC
    claim2.verify(proof2, 30)

    from ministark_tpu.verifier import VerificationError
    wrong = BrainfuckClaim(SRC, b"", bytes([6]))
    with pytest.raises(VerificationError):
        wrong.verify(proof2, 30)
