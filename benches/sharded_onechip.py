"""Run the hand-scheduled sharded executor on the REAL chip with a
1-device mesh: collectives degenerate but the code path — shard_map with
Pallas kernels inside (six-step NTT, SHA lanes hash, subtree build) — is
exactly what a multi-chip TPU prove runs per chip.  Validates that the
executor's per-chip bodies compile and execute on actual TPU hardware
(the CPU-mesh tests exercise the same programs via the XLA paths only).

Usage (plain env, real TPU): python benches/sharded_onechip.py [log2_values]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from ministark_tpu.air import ProofOptions
    from ministark_tpu.fields.scalar import Fp
    from ministark_tpu.models.fib import FibClaim, gen_trace
    from ministark_tpu.parallel import sharded
    from ministark_tpu.parallel.prover import prove_sharded

    log2_v = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    trace = gen_trace(1 << log2_v)
    claim = FibClaim(trace.last_value())
    opts = ProofOptions(num_queries=20, lde_blowup_factor=4,
                        grinding_factor=8, fri_folding_factor=8,
                        fri_max_remainder_coeffs=64)

    mesh = sharded.make_mesh(1)
    t0 = time.perf_counter()
    sharded_proof = prove_sharded(claim, opts, trace, mesh)
    t_shard = time.perf_counter() - t0
    print(f"sharded prove (1-chip mesh): {t_shard:.1f}s", flush=True)

    t0 = time.perf_counter()
    single = claim.prove(opts, trace)
    t_single = time.perf_counter() - t0
    print(f"single-chip prove:           {t_single:.1f}s", flush=True)

    same = sharded_proof.to_bytes(Fp) == single.to_bytes(Fp)
    print(f"proof bytes {'IDENTICAL' if same else 'MISMATCH'}", flush=True)
    claim.verify(sharded_proof, 20)
    print("verify OK", flush=True)
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
