"""Device big prime fields (Fp128 / Fp252 Montgomery limb vectors) vs exact
python bigint oracles — the counterpart of the reference's generic-field GPU
tests (gpu/tests/shaders.rs Fp252 cases, gpu/tests/fields.rs)."""

import numpy as np
import pytest

from ministark_tpu.fields.bigvec import BigDomain, Fp128Vec, Fp252Vec

FIELDS = [Fp128Vec, Fp252Vec]


def _rand_ints(field, n, seed=0):
    rng = np.random.default_rng(seed)
    # uniform below p via python ints from random bytes
    out = []
    nbytes = (field.p.bit_length() + 7) // 8 + 8
    for _ in range(n):
        out.append(int.from_bytes(rng.bytes(nbytes), "little") % field.p)
    return out


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_pack_unpack_roundtrip(f):
    vals = _rand_ints(f, 17) + [0, 1, f.p - 1]
    assert f.unpack(f.pack(vals)) == vals


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_add_sub_mul_neg(f):
    import jax

    a_i = _rand_ints(f, 33, seed=1) + [0, f.p - 1, 1]
    b_i = _rand_ints(f, 33, seed=2) + [f.p - 1, f.p - 1, 0]
    a = jax.numpy.asarray(f.pack(a_i))
    b = jax.numpy.asarray(f.pack(b_i))
    assert f.unpack(jax.jit(f.add)(a, b)) == [
        (x + y) % f.p for x, y in zip(a_i, b_i)]
    assert f.unpack(jax.jit(f.sub)(a, b)) == [
        (x - y) % f.p for x, y in zip(a_i, b_i)]
    assert f.unpack(jax.jit(f.mul)(a, b)) == [
        x * y % f.p for x, y in zip(a_i, b_i)]
    assert f.unpack(jax.jit(f.neg)(a)) == [(-x) % f.p for x in a_i]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_pow_inverse(f):
    import jax

    a_i = _rand_ints(f, 9, seed=3) + [1, f.p - 1]
    a = jax.numpy.asarray(f.pack(a_i))
    e = 0xDEADBEEF
    assert f.unpack(f.pow(a, e)) == [pow(x, e, f.p) for x in a_i]
    assert f.unpack(f.inverse(a)) == [pow(x, -1, f.p) for x in a_i]
    assert f.unpack(f.batch_inverse(a)) == [pow(x, -1, f.p) for x in a_i]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
@pytest.mark.parametrize("offset", [1, 7])
def test_ntt_roundtrip_and_oracle(f, offset):
    import jax.numpy as jnp

    n = 32
    dom = BigDomain(f, n, offset)
    coeffs_i = _rand_ints(f, n, seed=4)
    coeffs = jnp.asarray(f.pack(coeffs_i))

    evals = dom.fft(coeffs)
    # oracle: naive polynomial evaluation over the coset
    ev_i = f.unpack(evals)
    for k in [0, 1, 5, n - 1]:
        x = dom.element(k)
        want = 0
        for c in reversed(coeffs_i):
            want = (want * x + c) % f.p
        assert ev_i[k] == want

    back = dom.ifft(evals)
    assert f.unpack(back) == coeffs_i
