#!/usr/bin/env bash
# Full test gate, one command (VERDICT r3 weak #8: the slow-marked e2e
# proves ran only under `-m ""` and nothing automated them).
#
#   scripts/run_tests.sh          # default gate + slow e2e tests
#   scripts/run_tests.sh --fast   # default gate only (what `pytest tests/` runs)
#
# Environment discipline (CLAUDE.md): tests must run CPU-only with the axon
# plugin disarmed — when the TPU tunnel is down, ANY jax init under the
# ambient env blocks forever, even JAX_PLATFORMS=cpu.  This script scrubs
# the env itself so it works from a bare shell.
set -u
cd "$(dirname "$0")/.."

run() {
  env -u PALLAS_AXON_POOL_IPS PYTHONPATH="" JAX_PLATFORMS=cpu \
      TF_CPP_MIN_LOG_LEVEL=3 python -m pytest "$@"
}

echo "== default gate (skips slow) =="
run tests/ -q || exit 1

if [ "${1:-}" = "--fast" ]; then
  exit 0
fi

# Slow e2e tests: run per-file in fresh interpreters.  Same rationale as the
# SPMD isolation in conftest.py — XLA:CPU on this image can segfault on
# compiles late in a long in-process history; a fresh process per heavy file
# keeps the gate trustworthy (and the persistent compile cache makes warm
# runs fast).
rc=0
for f in $(grep -rl "pytest.mark.slow" tests/*.py | sort); do
  echo "== slow: $f =="
  # MS_TPU_SPMD_SUBPROCESS=1 lets the SPMD-isolated files collect inline —
  # safe here because each file already gets its own fresh interpreter.
  MS_TPU_SPMD_SUBPROCESS=1 run "$f" -q -m slow || rc=1
done
exit $rc
