"""Field-layer tests: device (lo,hi)-limb Goldilocks ops vs the exact Python
scalar model (test pattern mirrors gpu/tests/fields.rs: device vs CPU oracle)."""

import numpy as np
import pytest

from ministark_tpu.fields import Fp, Fq3, P, get_root_of_unity
from ministark_tpu.fields import device as fd


RNG = np.random.default_rng(0xC0FFEE)


def rand_vals(n, include_edges=True):
    vals = [int(x) for x in RNG.integers(0, P, size=n, dtype=np.uint64)]
    if include_edges:
        edges = [0, 1, 2, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1, (1 << 63)]
        vals[: len(edges)] = edges
    return [v % P for v in vals]


class TestScalar:
    def test_fp_basics(self):
        a, b = Fp(123456789123456789), Fp(P - 5)
        assert (a + b).v == (a.v + b.v) % P
        assert (a - b).v == (a.v - b.v) % P
        assert (a * b).v == (a.v * b.v) % P
        assert (a * a.inverse()).v == 1
        assert (-a + a).v == 0

    def test_root_of_unity(self):
        for log_n in [1, 4, 10, 20]:
            n = 1 << log_n
            w = get_root_of_unity(n)
            assert (w ** n).v == 1
            assert (w ** (n // 2)).v == P - 1  # primitive

    def test_fq3(self):
        a = Fq3(3, 5, 7)
        b = Fq3(11, 13, 17)
        # distributes over base mul
        assert a * Fp(9) == Fq3(27, 45, 63)
        # inverse
        inv = a.inverse()
        assert a * inv == Fq3.one()
        # associativity spot check
        assert (a * b) * a == a * (b * a)
        # u^3 == 2
        u = Fq3(0, 1, 0)
        assert u * u * u == Fq3(2)

    def test_serialization(self):
        a = Fp(0x0123456789ABCDEF % P)
        assert Fp.from_bytes(a.to_bytes()) == a
        q = Fq3(1, 2, 3)
        assert Fq3.from_bytes(q.to_bytes()) == q
        assert q.to_bytes()[:8] == Fp(1).to_bytes()


class TestDevice:
    def test_pack_roundtrip(self):
        vals = rand_vals(64)
        fp = fd.pack_np(vals)
        assert fd.to_ints(fp) == vals

    @pytest.mark.parametrize("op,model", [
        (fd.add, lambda a, b: (a + b) % P),
        (fd.sub, lambda a, b: (a - b) % P),
        (fd.mul, lambda a, b: (a * b) % P),
    ])
    def test_binary_ops(self, op, model):
        n = 256
        avals, bvals = rand_vals(n), rand_vals(n)
        # also hit a*b with both operands at edges
        bvals[: 9] = avals[:9]
        a = fd.pack_np(avals)
        b = fd.pack_np(bvals)
        got = fd.to_ints(op(a, b))
        want = [model(x, y) for x, y in zip(avals, bvals)]
        assert got == want

    def test_neg(self):
        vals = rand_vals(64)
        got = fd.to_ints(fd.neg(fd.pack_np(vals)))
        assert got == [(-v) % P for v in vals]

    def test_mul64_wide(self):
        vals_a = rand_vals(32)
        vals_b = rand_vals(32)
        a = fd.pack_np(vals_a)
        b = fd.pack_np(vals_b)
        r0, r1, r2, r3 = fd.mul64_wide(a, b)
        prod = (
            np.asarray(r0, np.object_)
            + (np.asarray(r1, np.object_) << 32)
            + (np.asarray(r2, np.object_) << 64)
            + (np.asarray(r3, np.object_) << 96)
        )
        want = [x * y for x, y in zip(vals_a, vals_b)]
        assert list(prod) == want

    def test_pow_const(self):
        vals = rand_vals(32)
        a = fd.pack_np(vals)
        for e in [0, 1, 2, 5, P - 2]:
            got = fd.to_ints(fd.pow_const(a, e))
            assert got == [pow(v, e, P) for v in vals]

    def test_inv_and_batch_inv(self):
        vals = [v if v != 0 else 7 for v in rand_vals(128)]
        a = fd.pack_np(vals)
        got = fd.to_ints(fd.inv(a))
        want = [pow(v, P - 2, P) for v in vals]
        assert got == want
        got_b = fd.to_ints(fd.batch_inv(a))
        assert got_b == want

    def test_batch_inv_2d(self):
        vals = [v if v != 0 else 3 for v in rand_vals(64)]
        a = fd.pack_np(vals)
        a2 = (a[0].reshape(4, 16), a[1].reshape(4, 16))
        got = fd.unpack_np(fd.batch_inv(a2, axis=-1)).ravel().tolist()
        assert got == [pow(v, P - 2, P) for v in vals]


class TestDeviceExt3:
    def rand_ext(self, n):
        return [Fq3(*[int(x) for x in RNG.integers(0, P, size=3, dtype=np.uint64)]) for _ in range(n)]

    def test_mul(self):
        n = 32
        avals, bvals = self.rand_ext(n), self.rand_ext(n)
        a = fd.ext3_pack_np(avals)
        b = fd.ext3_pack_np(bvals)
        got = fd.ext3_unpack_np(fd.ext3_mul(a, b))
        want = [x * y for x, y in zip(avals, bvals)]
        assert got == want

    def test_add_sub_neg(self):
        n = 32
        avals, bvals = self.rand_ext(n), self.rand_ext(n)
        a = fd.ext3_pack_np(avals)
        b = fd.ext3_pack_np(bvals)
        assert fd.ext3_unpack_np(fd.ext3_add(a, b)) == [x + y for x, y in zip(avals, bvals)]
        assert fd.ext3_unpack_np(fd.ext3_sub(a, b)) == [x - y for x, y in zip(avals, bvals)]
        assert fd.ext3_unpack_np(fd.ext3_neg(a)) == [-x for x in avals]

    def test_inv(self):
        n = 16
        avals = self.rand_ext(n)
        a = fd.ext3_pack_np(avals)
        got = fd.ext3_unpack_np(fd.ext3_inv(a))
        assert got == [x.inverse() for x in avals]
        got_b = fd.ext3_unpack_np(fd.ext3_batch_inv(a))
        assert got_b == [x.inverse() for x in avals]

    def test_pow(self):
        avals = self.rand_ext(8)
        a = fd.ext3_pack_np(avals)
        got = fd.ext3_unpack_np(fd.ext3_pow_const(a, 12345))
        assert got == [x ** 12345 for x in avals]
