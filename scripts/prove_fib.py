"""Fib AIR end-to-end prove (+ optional verify) driver with phase timers.

Usage:  python scripts/prove_fib.py [log2_values] [--verify]

Runs on whatever backend JAX_PLATFORMS selects (axon = the real chip).
Reference workload (examples/fib/main.rs:224-229): 2^24 values
(2^21 rows x 8 cols), blowup 4, 32 queries, grind 8, fold 8, remainder 64.
Pass 24 for the full reference size; smaller powers for smoke runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    log2_n = int(args[0]) if args else 16
    do_verify = "--verify" in sys.argv

    import ministark_tpu  # noqa: F401  (sets up the persistent compile cache)
    from ministark_tpu.air import ProofOptions
    from ministark_tpu.models.fib import FibClaim, gen_trace

    n = 1 << log2_n
    t0 = time.perf_counter()
    trace = gen_trace(n)
    print(f"trace gen ({n // 8} rows x 8 cols): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    opts = ProofOptions(num_queries=32, lde_blowup_factor=4,
                        grinding_factor=8, fri_folding_factor=8,
                        fri_max_remainder_coeffs=64)
    claim = FibClaim(trace.last_value())

    repeat = 2 if "--repeat" in sys.argv else 1
    for i in range(repeat):
        t0 = time.perf_counter()
        proof = claim.prove(opts, trace)
        dt = time.perf_counter() - t0
        label = "PROVE total" if i == 0 else "PROVE warm"
        print(f"{label}: {dt:.1f}s", flush=True)

    from ministark_tpu import serde
    w = serde.Writer()
    proof.serialize(w, claim.fq)
    print(f"proof size: {len(w.bytes()) / 1024:.1f} KB, "
          f"security {proof.security_level_bits()} bits")

    if do_verify:
        t0 = time.perf_counter()
        claim.verify(proof, 30)
        print(f"VERIFY: {time.perf_counter() - t0:.1f}s — OK")


if __name__ == "__main__":
    main()
