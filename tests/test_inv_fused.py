"""One-pass Pallas Fermat inversion vs the Montgomery-scan batch inverse."""

import numpy as np
import pytest

from ministark_tpu.fields import device as fd
from ministark_tpu.fields.scalar import P
from ministark_tpu.ops.inv_pallas import inv_ext3_pallas, inv_fp_pallas


@pytest.mark.slow
def test_inv_fp_pallas_matches_scan(no_persistent_cache):
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n = 4096
    vals = rng.integers(1, P, n, dtype=np.uint64)
    lo, hi = fd.pack_np(vals)
    a = (jnp.asarray(lo), jnp.asarray(hi))
    ref = fd.to_ints(fd._batch_inv_scan(a))
    got = fd.to_ints(inv_fp_pallas(a, interpret=True))
    assert got == ref
    # spot-check algebra
    assert (int(vals[0]) * ref[0]) % P == 1


@pytest.mark.slow
def test_inv_ext3_pallas_matches_scan(no_persistent_cache):
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    n = 4096
    comps = []
    for _ in range(3):
        lo, hi = fd.pack_np(rng.integers(1, P, n, dtype=np.uint64))
        comps.append((jnp.asarray(lo), jnp.asarray(hi)))
    a = tuple(comps)
    ref = [fd.to_ints(c) for c in fd._ext3_batch_inv_scan(a)]
    got = [fd.to_ints(c) for c in inv_ext3_pallas(a, interpret=True)]
    assert got == ref


@pytest.mark.slow
def test_inv_fp_hybrid_matches_fermat(no_persistent_cache):
    """Hybrid Montgomery-in-registers kernel (eligible sizes) vs host
    Fermat, zeros included (0 -> 0)."""
    import jax.numpy as jnp

    from ministark_tpu.fields import npfield

    rng = np.random.default_rng(9)
    n = 1 << 16  # rows = 128 = BLOCK_R * HYBRID_K -> hybrid path
    vals = rng.integers(0, P, n, dtype=np.uint64)
    vals[::977] = 0  # sprinkle zeros
    lo, hi = fd.pack_np(vals)
    a = (jnp.asarray(lo), jnp.asarray(hi))
    got = inv_fp_pallas(a, interpret=True)
    want = npfield.inv(vals)
    assert np.array_equal(
        np.asarray(got[0], np.uint64)
        | (np.asarray(got[1], np.uint64) << np.uint64(32)), want)
