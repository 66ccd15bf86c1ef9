"""Sharded (8-device CPU mesh) vs single-device equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from ministark_tpu import merkle
from ministark_tpu.fields import device as fd
from ministark_tpu.fields.scalar import GENERATOR, P
from ministark_tpu.models.fib import gen_trace
from ministark_tpu.ntt import Domain
from ministark_tpu.parallel import sharded
from ministark_tpu.fri import fold_evals
from ministark_tpu.fields.scalar import Fp


def test_sharded_commit_matches_single_device():
    mesh = sharded.make_mesh(8)
    trace = gen_trace(1 << 10)
    m = trace.base_columns()
    trace_dom = Domain(m.num_rows)
    lde_dom = Domain(m.num_rows * 4, GENERATOR)

    fn = sharded.sharded_lde_and_commit(mesh, trace_dom, lde_dom)
    lo_s, hi_s = sharded.shard_columns(mesh, (m.lo, m.hi))
    lde_lo, lde_hi, root = fn(lo_s, hi_s)

    # single-device reference
    polys = m.interpolate(trace_dom)
    lde = polys.evaluate(lde_dom)
    tree = merkle.commit_matrix_fp(lde.lo, lde.hi)
    expected_root = tree.root()
    got_root = b"".join(int(w).to_bytes(4, "big") for w in np.asarray(root))
    assert got_root == expected_root
    assert np.array_equal(np.asarray(lde_lo), np.asarray(lde.lo))


def test_sharded_fri_fold_matches_single_device():
    mesh = sharded.make_mesh(8)
    n, N = 1 << 10, 4
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, n, dtype=np.uint64)
    lo, hi = fd.pack_np(vals)

    fold = sharded.sharded_fri_fold(mesh, n, N)
    from jax.sharding import NamedSharding, PartitionSpec as PSpec
    rsh = NamedSharding(mesh, PSpec("col"))
    alpha = 123456789123456789 % P
    out = fold(jax.device_put(jnp.asarray(lo), rsh),
               jax.device_put(jnp.asarray(hi), rsh),
               jnp.uint32(alpha & 0xFFFFFFFF), jnp.uint32(alpha >> 32))

    ref = fold_evals(fd.ext3_from_base((jnp.asarray(lo), jnp.asarray(hi))), n, N, Fp(alpha))
    got = fd.unpack_np((np.asarray(out[0]), np.asarray(out[1])))
    want = fd.unpack_np(ref[0])
    assert np.array_equal(got, want)
