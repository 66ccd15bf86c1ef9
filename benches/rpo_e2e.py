"""Fully-algebraic configuration bench: fib prove with RPO-256 Merkle trees
AND an RPO-256 public coin (merkle_hash = coin_hash = hash_rpo — the
`Stark` associated-type knobs; reference analogue: `MerkleTreeImpl<Rpo256>` /
`PublicCoinImpl<F, Rpo256>`, src/stark.rs:25-35, src/random.rs:62-86).

Run on the real chip (plain env):  python benches/rpo_e2e.py [log2_values]
Default 2^20 values (2^17 rows x 8 cols).  Prints warm-prove JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from ministark_tpu import hash_rpo
    from ministark_tpu.air import ProofOptions
    from ministark_tpu.models.fib import FibClaim, gen_trace

    class FibClaimRpoFull(FibClaim):
        merkle_hash = hash_rpo
        coin_hash = hash_rpo

    trace = gen_trace(1 << log2_n)
    opts = ProofOptions(num_queries=32, lde_blowup_factor=4,
                        grinding_factor=8, fri_folding_factor=8,
                        fri_max_remainder_coeffs=64)
    claim = FibClaimRpoFull(trace.last_value())

    t0 = time.perf_counter()
    proof = claim.prove(opts, trace)
    cold = time.perf_counter() - t0

    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        proof = claim.prove(opts, trace)
        times.append(time.perf_counter() - t0)
    claim.verify(proof, 30)

    from ministark_tpu import serde
    w = serde.Writer()
    proof.serialize(w, claim.fq)
    print(json.dumps({
        "bench": "rpo_e2e", "values": 1 << log2_n,
        "cold_s": round(cold, 1), "warm_s": round(min(times), 3),
        "proof_kb": round(len(w.bytes()) / 1024, 1),
        "security_bits": proof.security_level_bits(
            claim.fq, merkle_security=hash_rpo.COLLISION_RESISTANCE,
            coin_security=hash_rpo.COLLISION_RESISTANCE),
    }), flush=True)


if __name__ == "__main__":
    main()
