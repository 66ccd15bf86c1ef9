"""Rescue-Prime: parameter generation, primitive, and hash-chain AIR."""

import pytest

from ministark_tpu.air import Challenges, ProofOptions
from ministark_tpu.fields.scalar import Fp, P
from ministark_tpu.fields.fp252 import Fp252, P252
from ministark_tpu.models.rescue import (
    RescueClaim,
    RescueParams,
    chain_digest,
    gen_trace,
    goldilocks_params,
)
from ministark_tpu.models.rescue.primitive import _matvec


def test_params_goldilocks():
    p = goldilocks_params()
    assert p.alpha == 7
    assert (p.alpha * p.alpha_inv) % (P - 1) == 1
    assert len(p.round_constants) == 2 * 4 * 14
    # MDS invertible
    v = [Fp(3), Fp(1), Fp(4), Fp(1)]
    assert _matvec(p.mds_inv, _matvec(p.mds, v)) == v


def test_params_fp252():
    # the reference's instantiation: m=4, capacity=2, N=14, security 256
    p = RescueParams(Fp252, P252, 3, 4, 2, 14, 256, 2)
    assert p.alpha == 3
    assert (p.alpha * p.alpha_inv) % (P252 - 1) == 1
    out = p.hash([Fp252(1), Fp252(1)])
    assert len(out) == 2 and not out[0].is_zero()


def test_sponge_padding_changes_digest():
    p = goldilocks_params()
    a = p.hash([Fp(1), Fp(2)])
    b = p.hash([Fp(1), Fp(2), Fp(0)])
    assert a != b  # padding must domain-separate


def test_trace_satisfies_constraints():
    from ministark_tpu import debug
    trace, digest = gen_trace((7, 8), 4)
    claim = RescueClaim(7, 8, digest[0].v, digest[1].v)
    opts = ProofOptions(8, 8, 0, 4, 16)
    air = claim.build_air(64, opts)
    hints = air.gen_hints(Challenges())
    debug.validate_constraints(air, Challenges(), hints, trace.base_columns(), None)


def test_bad_digest_fails_constraints():
    from ministark_tpu import debug
    trace, digest = gen_trace((7, 8), 4)
    claim = RescueClaim(7, 8, digest[0].v + 1, digest[1].v)
    opts = ProofOptions(8, 8, 0, 4, 16)
    air = claim.build_air(64, opts)
    hints = air.gen_hints(Challenges())
    with pytest.raises(debug.ConstraintViolation):
        debug.validate_constraints(air, Challenges(), hints, trace.base_columns(), None)


def test_prove_verify_roundtrip():
    trace, digest = gen_trace((7, 8), 4)
    claim = RescueClaim(7, 8, digest[0].v, digest[1].v)
    opts = ProofOptions(num_queries=8, lde_blowup_factor=8, grinding_factor=0,
                        fri_folding_factor=4, fri_max_remainder_coeffs=16)
    proof = claim.prove(opts, trace)
    claim.verify(proof, 10)

    from ministark_tpu.verifier import VerificationError
    bad_claim = RescueClaim(7, 8, digest[0].v + 1, digest[1].v)
    with pytest.raises(VerificationError):
        bad_claim.verify(proof, 10)
