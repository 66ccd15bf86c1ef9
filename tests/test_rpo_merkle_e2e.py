"""End-to-end proof with RPO-256 Merkle trees (the `merkle_hash` knob — the
reference's MerkleTree associated type, src/stark.rs:25-35).  The transcript
coin stays SHA-256 (independent associated type, like the reference)."""

import pytest

from ministark_tpu import hash_rpo
from ministark_tpu.air import ProofOptions
from ministark_tpu.fields.scalar import Fp
from ministark_tpu.models.fib import FibClaim, gen_trace
from ministark_tpu.proof import Proof
from ministark_tpu.verifier import VerificationError

OPTS = ProofOptions(num_queries=8, lde_blowup_factor=4, grinding_factor=0,
                    fri_folding_factor=4, fri_max_remainder_coeffs=4)


class FibClaimRpo(FibClaim):
    merkle_hash = hash_rpo


@pytest.mark.slow
def test_rpo_merkle_prove_verify_roundtrip():
    trace = gen_trace(128)
    claim = FibClaimRpo(trace.last_value())
    proof = claim.prove(OPTS, trace)
    data = proof.to_bytes(Fp)
    claim.verify(Proof.from_bytes(data, Fp, Fp), 8)

    # a SHA-256-tree verifier must reject the RPO-tree proof
    sha_claim = FibClaim(trace.last_value())
    with pytest.raises(VerificationError):
        sha_claim.verify(Proof.from_bytes(data, Fp, Fp), 8)

    # tamper a queried trace value -> merkle row check fails
    bad = Proof.from_bytes(data, Fp, Fp)
    bad.trace_queries.base_trace_values[0] = (
        bad.trace_queries.base_trace_values[0] + Fp(1))
    with pytest.raises(VerificationError):
        claim.verify(bad, 8)


def test_rpo_tree_matches_host_hash():
    """Device RPO row-hash/merge vs the exact host implementation."""
    import numpy as np
    import jax.numpy as jnp

    from ministark_tpu import merkle
    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import P

    rng = np.random.default_rng(3)
    n, ncols = 64, 3
    vals = rng.integers(0, P, (ncols, n), dtype=np.uint64)
    lo, hi = fd.pack_np(vals)
    tree = merkle.commit_matrix_fp(jnp.asarray(lo), jnp.asarray(hi),
                                   bit_reversed_input=True,
                                   hashfn=hash_rpo)
    # leaf 0 = RPO hash of row 0
    row = [Fp(int(vals[c, 0])) for c in range(ncols)]
    assert tree.leaf(0) == hash_rpo.hash_elements(row)
    # root chains merges correctly: verify a multi-proof
    view = tree.prove([0, 5, 63])
    merkle.verify_rows(tree.root(), [0, 5, 63],
                       [[Fp(int(vals[c, i])) for c in range(ncols)]
                        for i in (0, 5, 63)],
                       view, hashfn=hash_rpo)


class FibClaimRpoFull(FibClaim):
    """Fully algebraic transcript: RPO Merkle trees AND RPO public coin
    (both associated-type knobs, src/stark.rs:25-35)."""
    from ministark_tpu import hash_rpo as _rpo
    merkle_hash = _rpo
    coin_hash = _rpo


@pytest.mark.slow
def test_rpo_coin_and_merkle_prove_verify_roundtrip():
    trace = gen_trace(128)
    claim = FibClaimRpoFull(trace.last_value())
    opts = ProofOptions(num_queries=8, lde_blowup_factor=4,
                        grinding_factor=3, fri_folding_factor=4,
                        fri_max_remainder_coeffs=4)
    proof = claim.prove(opts, trace)
    data = proof.to_bytes(Fp)
    claim.verify(Proof.from_bytes(data, Fp, Fp), 8)

    # transcripts are incompatible with the SHA-coin config
    sha_claim = FibClaim(trace.last_value())
    with pytest.raises(VerificationError):
        sha_claim.verify(Proof.from_bytes(data, Fp, Fp), 8)


def test_device_rpo_grind_matches_host_verify():
    """ops/pow.grind_rpo must produce a nonce the host RPO coin accepts,
    and must find the same smallest nonce as the host grind."""
    from ministark_tpu.ops import pow as dpow
    from ministark_tpu.random import PublicCoin

    seed = bytes(range(32))
    bits = 6
    nonce = dpow.grind_rpo(seed, bits)
    coin = PublicCoin(seed, hashfn=hash_rpo)
    assert coin.verify_proof_of_work(bits, nonce)
    # host smallest-nonce scan agrees (tiny bits => a few iterations)
    host = 1
    while not coin.verify_proof_of_work(bits, host):
        host += 1
    assert nonce == host
