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
