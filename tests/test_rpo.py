"""RPO-256: device batched implementation vs host scalar implementation
(plus structural sanity of the public parameters)."""

import numpy as np
import jax.numpy as jnp

from ministark_tpu import hash_rpo
from ministark_tpu.fields import Fp, P
from ministark_tpu.fields import device as fd
from ministark_tpu.ops import rpo256


RNG = np.random.default_rng(123)


def test_mds_is_small_circulant():
    assert rpo256.MDS.max() < 32
    first = rpo256.MDS[0]
    for m in range(12):
        assert list(rpo256.MDS[m]) == list(np.roll(first, m))


def test_permute_device_matches_host():
    batch = 4
    vals = RNG.integers(0, P, size=(batch, 12), dtype=np.uint64)
    lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((vals >> 32).astype(np.uint32))
    out = rpo256.permute((lo, hi))
    got = fd.unpack_np(out)
    for b in range(batch):
        want = hash_rpo._permute([int(v) for v in vals[b]])
        assert got[b].tolist() == want, f"row {b}"


def test_hash_elements_device_matches_host():
    for ncols in [4, 8, 11, 16]:
        n = 8
        vals = RNG.integers(0, P, size=(ncols, n), dtype=np.uint64)
        cols = [fd.pack_np(vals[c]) for c in range(ncols)]
        dlo, dhi = rpo256.hash_elements_batch(cols)
        got = fd.unpack_np((dlo, dhi))  # (n, 4)
        for r in range(n):
            want = hash_rpo.hash_elements([Fp(int(vals[c, r])) for c in range(ncols)])
            got_bytes = b"".join(int(v).to_bytes(8, "little") for v in got[r])
            assert got_bytes == want, f"ncols={ncols} row={r}"


def test_merge_device_matches_host():
    batch = 3
    a = RNG.integers(0, P, size=(batch, 4), dtype=np.uint64)
    b = RNG.integers(0, P, size=(batch, 4), dtype=np.uint64)
    al, ah = fd.pack_np(a)
    bl, bh = fd.pack_np(b)
    out = rpo256.merge_digests((jnp.asarray(al), jnp.asarray(ah)),
                               (jnp.asarray(bl), jnp.asarray(bh)))
    got = fd.unpack_np(out)
    for i in range(batch):
        d0 = b"".join(int(v).to_bytes(8, "little") for v in a[i])
        d1 = b"".join(int(v).to_bytes(8, "little") for v in b[i])
        want = hash_rpo.merge(d0, d1)
        got_bytes = b"".join(int(v).to_bytes(8, "little") for v in got[i])
        assert got_bytes == want
