"""Security accounting asks the configured hashes (src/proof.rs:122-148 asks
the MerkleTree/PublicCoin types via security_level_bits), and ProofOptions
validates the FRI parameter shapes fri.py supports."""

import pytest

from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fp
from ministark_tpu.fri import FriProof
from ministark_tpu.proof import Proof, Queries


def _dummy_proof(trace_len=1 << 10, blowup=4, queries=8, grind=2):
    opts = ProofOptions(num_queries=queries, lde_blowup_factor=blowup,
                        grinding_factor=grind, fri_folding_factor=4,
                        fri_max_remainder_coeffs=16)
    return Proof(
        options=opts, trace_len=trace_len,
        base_trace_commitment=b"\0" * 32,
        extension_trace_commitment=None,
        composition_trace_commitment=b"\0" * 32,
        fri_proof=FriProof([], []),
        pow_nonce=0,
        trace_queries=Queries([], [], [], None, None, None),
        execution_trace_ood_evals=[Fp(1)],
        composition_trace_ood_evals=[Fp(1)],
    )


def test_configured_hash_bounds_security():
    p = _dummy_proof(queries=128, grind=50)  # query security 306, field ~52
    # field security dominates here: 64 - log2(4096) = 52
    assert p.security_level_bits(Fp) == 52
    # a weaker merkle hash must cap it below the field bound
    assert p.security_level_bits(Fp, merkle_security=40) == 40
    assert p.security_level_bits(Fp, coin_security=33) == 33


def test_query_security_with_defaults():
    p = _dummy_proof(queries=8, grind=2)  # 2*8+2 = 18
    assert p.security_level_bits(Fp) == 18


def test_fri_folding_factor_validated():
    for bad in (1, 3, 32, 0):
        with pytest.raises(AssertionError):
            ProofOptions(num_queries=8, lde_blowup_factor=4,
                         grinding_factor=0, fri_folding_factor=bad,
                         fri_max_remainder_coeffs=16)
    for good in (2, 4, 8, 16):
        ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=0,
                     fri_folding_factor=good, fri_max_remainder_coeffs=16)


def test_fri_remainder_coeffs_validated():
    for bad in (0, 3, 24):
        with pytest.raises(AssertionError):
            ProofOptions(num_queries=8, lde_blowup_factor=4,
                         grinding_factor=0, fri_folding_factor=4,
                         fri_max_remainder_coeffs=bad)
    ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=0,
                 fri_folding_factor=4, fri_max_remainder_coeffs=64)
