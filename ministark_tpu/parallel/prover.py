"""Multi-chip proving (no reference counterpart — the reference is
single-device; SURVEY.md §2.5-2.6 derives the collective points).

``prove_sharded`` runs the UNCHANGED proving pipeline
(`prover.default_prove`) with every trace matrix sharded over a
``jax.sharding.Mesh`` axis.  The phase programs are already jitted
whole-phase device programs; handing them column-sharded operands makes
XLA's SPMD partitioner compile partitioned executables and insert the
collectives (all-to-alls at the row-hash boundary, gathers for the Merkle
tip and transcript scalars) — the scaling-book recipe: pick a mesh,
annotate shardings on the data, let the compiler place communication.

Because the partitioned programs compute the *same function*, the proof
bytes are identical to the single-chip prover's (asserted by
tests/test_sharded_prove.py).  The hand-scheduled ``shard_map`` paths in
``parallel/sharded.py`` / ``parallel/ntt.py`` remain the
controlled-communication kernels for the hot phases (LDE+commit, FRI
folds) where collective placement must ride ICI exactly at the
Merkle/FRI boundaries (BASELINE.md).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from .. import prover, runtime
from ..matrix import Matrix, MatrixExt3


def _shard_matrix(m, mesh: Mesh, axis: str):
    """Shard a Matrix/MatrixExt3 over `axis`: on columns when the width
    divides the mesh (the zero-comms layout for the transforms), else on the
    domain axis (always a power of two >= mesh size) — device_put requires
    evenly divisible dimensions."""
    d = mesh.devices.size
    ncols = m.num_cols
    spec = (PSpec(axis, None) if ncols % d == 0 else PSpec(None, axis))
    sh = NamedSharding(mesh, spec)

    def put(x):
        return jax.device_put(x, sh)

    if isinstance(m, MatrixExt3):
        return MatrixExt3(*[(put(c[0]), put(c[1])) for c in m.c])
    return Matrix(put(m.lo), put(m.hi))


class _ShardedTrace:
    """Trace proxy whose matrices carry the mesh sharding."""

    def __init__(self, inner, mesh: Mesh, axis: str):
        self._inner = inner
        self._mesh = mesh
        self._axis = axis

    def base_columns(self):
        return _shard_matrix(self._inner.base_columns(), self._mesh, self._axis)

    def build_extension_columns(self, challenges):
        ext = self._inner.build_extension_columns(challenges)
        if ext is None:
            return None
        return _shard_matrix(ext, self._mesh, self._axis)

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __len__(self):
        return len(self._inner)


class _ShardedStark:
    """Stark proxy that shards the generated trace before proving and
    carries the hand-scheduled shard_map executor for the hot phases."""

    def __init__(self, inner, mesh: Mesh, axis: str):
        self._inner = inner
        self._mesh = mesh
        self._axis = axis
        from .executor import ShardedExecutor

        self.sharded_executor = ShardedExecutor(mesh, axis)

    def generate_trace(self, witness):
        return _ShardedTrace(self._inner.generate_trace(witness),
                             self._mesh, self._axis)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def prove_sharded(stark, options, witness, mesh: Mesh, axis: str = "col",
                  validate: bool = False):
    """Prove on a device mesh; returns a Proof byte-identical to
    ``stark.prove(options, witness)`` on one chip.

    Hot phases (LDE+commit, FRI folds and layer commits) run as
    hand-scheduled shard_map programs whose per-chip bodies use the SAME
    fused Pallas paths as the single-chip prover (parallel/executor.py);
    the remaining phases (constraint eval, composition commit, DEEP) run
    under ``spmd_mode``: GSPMD auto-partitions them from the operand
    shardings with Pallas/host-callback paths disabled (GSPMD cannot
    partition pallas_call over mesh-sharded operands, and callbacks abort
    when operands arrive sharded).  Program caches key on runtime.spmd(),
    so single-chip executables are not clobbered."""
    proxy = _ShardedStark(stark, mesh, axis)
    with runtime.spmd_mode():
        return prover.default_prove(proxy, options, witness, validate=validate)
