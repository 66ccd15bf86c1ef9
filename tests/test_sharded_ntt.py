"""Distributed six-step NTT (8-device CPU mesh) vs single-device Domain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ministark_tpu.fields import device as fd
from ministark_tpu.fields.scalar import GENERATOR, P
from ministark_tpu.ntt import Domain
from ministark_tpu.parallel import sharded
from ministark_tpu.parallel.ntt import ShardedDomain


def _rand_fp(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=n, dtype=np.uint64)


def _put(mesh, vals):
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    lo, hi = fd.pack_np(vals)
    sh = NamedSharding(mesh, PSpec("col"))
    return (jax.device_put(lo, sh), jax.device_put(hi, sh))


@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_sharded_fft_fp_matches_domain(offset):
    mesh = sharded.make_mesh(8)
    n = 1 << 10
    sdom = ShardedDomain(mesh, n, offset)
    dom = Domain(n, offset)

    vals = _rand_fp(n, seed=1)
    x = _put(mesh, vals)
    got = sdom.fft_fp(x)
    want = dom.fft_fp((jnp.asarray(fd.pack_np(vals)[0]),
                       jnp.asarray(fd.pack_np(vals)[1])))
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))


@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_sharded_ifft_fp_roundtrip(offset):
    mesh = sharded.make_mesh(8)
    n = 1 << 10
    sdom = ShardedDomain(mesh, n, offset)

    vals = _rand_fp(n, seed=2)
    x = _put(mesh, vals)
    back = sdom.ifft_fp(sdom.fft_fp(x))
    assert np.array_equal(fd.unpack_np((np.asarray(back[0]),
                                        np.asarray(back[1]))), vals)


def test_sharded_fft_ext3_matches_domain():
    mesh = sharded.make_mesh(8)
    n = 1 << 10
    sdom = ShardedDomain(mesh, n, GENERATOR)
    dom = Domain(n, GENERATOR)

    comps = [_rand_fp(n, seed=3 + i) for i in range(3)]
    x = tuple(_put(mesh, c) for c in comps)
    got = sdom.fft_ext3(x)
    want = dom.fft_ext3(tuple(
        (jnp.asarray(fd.pack_np(c)[0]), jnp.asarray(fd.pack_np(c)[1]))
        for c in comps))
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g[0]), np.asarray(w[0]))
        assert np.array_equal(np.asarray(g[1]), np.asarray(w[1]))
