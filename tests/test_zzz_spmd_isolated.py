"""Run each SPMD/shard_map test file in a FRESH interpreter.

XLA:CPU on this image segfaults on later compiles (observed: inside a
compile-cache write) once shard_map/SPMD executables have run in-process —
the documented after-SPMD landmine (CLAUDE.md).  Collecting those files in
the main pytest process is disabled by conftest.py; this module — named so
it sorts last — spawns one subprocess per file, inheriting the conftest
environment (CPU backend, 8 virtual devices, fusion off, persistent cache)
so each file sees exactly the state it sees when run alone.

The reference CI analogue is .github/workflows/ci.yml `cargo test
--workspace`: a gate that actually exits green.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from conftest import SPMD_ISOLATED_FILES

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TESTS_DIR)

# Exit code 5 = "no tests collected" — happens when the inherited marker
# expression (e.g. the default -m "not slow") deselects every test in the
# file.  That is a pass, not a failure.
_OK_CODES = (0, 5)


@pytest.mark.parametrize("fname", SPMD_ISOLATED_FILES)
def test_spmd_file_in_subprocess(fname, request):
    path = os.path.join(_TESTS_DIR, fname)
    assert os.path.exists(path), path

    markexpr = request.config.option.markexpr  # inherit -m selection
    cmd = [sys.executable, "-m", "pytest", path, "-q", "-p", "no:cacheprovider"]
    if markexpr is not None:
        cmd += ["-m", markexpr]

    env = dict(os.environ, MS_TPU_SPMD_SUBPROCESS="1")
    proc = subprocess.run(cmd, cwd=_REPO, env=env, capture_output=True,
                          text=True, timeout=3600)
    if proc.returncode not in _OK_CODES:
        pytest.fail(
            f"{fname} failed in subprocess (exit {proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout[-8000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
