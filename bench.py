"""Driver benchmark: prints ONE JSON line.

Metric: 2^22-point Goldilocks coset NTT throughput on one chip (BASELINE.md
kernel metric).  Variance control (the axon relay adds per-dispatch noise
that swamped earlier rounds' numbers — 273 vs 616 Melem/s for the same
code): K transforms are CHAINED INSIDE ONE JITTED PROGRAM with a single
readback, and the reported value is the MIN over REPEATS timed runs.

`vs_baseline` is measured against round 1's first recorded value for this
metric (299.5 Melem/s, BENCH_r01.json) — the reference itself publishes no
absolute numbers (BASELINE.md), so progress is tracked against our own
first measurement.

The measurement runs in a child process with a watchdog: when the
remote-TPU tunnel is unreachable, jax initialization blocks forever inside
the axon plugin — the parent kills the child and exits nonzero instead of
hanging the driver.  On watchdog timeout it falls back to a CPU measurement
(clearly labelled) so the round still records *a* number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_TPU_TIMEOUT_S = 1800  # first chained-2^22 compile on the relay takes minutes
_BASELINE_MELEM_S = 299.5  # BENCH_r01.json
_CHAIN = 8      # transforms fused into one program
_REPEATS = 5    # timed runs; min is reported


def _measure():
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ministark_tpu.fields import device as fd
    from ministark_tpu.fields.scalar import GENERATOR, P
    from ministark_tpu.ntt import Domain

    n = 1 << 22
    dom = Domain(n, GENERATOR)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    lo, hi = fd.pack_np(vals)
    x = (jnp.asarray(lo), jnp.asarray(hi))

    @functools.partial(jax.jit, static_argnums=())
    def chained(x, tbl, scale, tmat, brv):
        for _ in range(_CHAIN):
            x = dom._fft_fp_impl(x, tbl, scale, tmat, brv)
        return x

    args = (dom._fwd_tbl(), dom._scale_tbl(), dom._fwd_tmat(),
            dom._scale_brv_tbl())

    # warmup/compile (a host readback forces full materialization — plain
    # block_until_ready returns early through the axon relay)
    out = chained(x, *args)
    _ = int(out[0][0])

    times = []
    for _ in range(_REPEATS):
        t0 = time.perf_counter()
        out = chained(out, *args)
        _ = int(out[0][0])
        times.append(time.perf_counter() - t0)

    melem_s = _CHAIN * n / min(times) / 1e6
    backend = jax.default_backend()
    print(json.dumps({
        "metric": "2^22-pt Goldilocks coset NTT"
                  + ("" if backend != "cpu" else " (CPU FALLBACK)"),
        "value": round(melem_s, 2),
        "unit": "Melem/s/chip",
        "vs_baseline": round(melem_s / _BASELINE_MELEM_S, 3),
    }))


def main():
    if os.environ.get("MINISTARK_BENCH_CHILD") == "1":
        _measure()
        return

    env = dict(os.environ, MINISTARK_BENCH_CHILD="1")
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              timeout=_TPU_TIMEOUT_S, env=env)
        if proc.returncode == 0:
            return
        print(f"bench child failed (exit {proc.returncode})", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"bench child exceeded {_TPU_TIMEOUT_S}s "
              "(remote-TPU tunnel unreachable?)", file=sys.stderr)

    # CPU fallback: scrubbed env so the axon plugin can't block jax init.
    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, MINISTARK_BENCH_CHILD="1",
               PYTHONPATH=repo, JAX_PLATFORMS="cpu",
               TF_CPP_MIN_LOG_LEVEL="3",
               XLA_FLAGS="--xla_disable_hlo_passes=fusion,cpu-fusion")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                          timeout=3 * _TPU_TIMEOUT_S, env=env)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
