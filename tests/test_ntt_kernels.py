"""Pins the Pallas NTT kernels and the lazy field arithmetic they rely on.

The prover's default large-n path on TPU is `ntt._ntt_sixstep_pallas_fp`
(two fused `col_ntt` kernels chained through a transpose with canon=False),
which never activates on the CPU test backend — so it is tested here in
Pallas interpret mode against exact Python oracles, alongside the XLA
six-step branch (n >= 2^14 on CPU) and boundary-value property tests of
add_lazy/sub_lazy/mul_lazy (ops/ntt_pallas.py chains these across butterfly
stages; a silent wrong carry corrupts the NTT and the proof).

Oracle pattern: gpu/tests/shaders.rs (GPU FFT vs arkworks CPU FFT).
"""

import functools
import itertools

import numpy as np
import pytest

from ministark_tpu.fields.scalar import P, GENERATOR
from ministark_tpu.fields import device as fd
from ministark_tpu import ntt
from ministark_tpu.ops import ntt_pallas

RNG = np.random.default_rng(7)

EPS = 0xFFFFFFFF  # 2^32 - 1 == 2^64 mod p
U64_MAX = (1 << 64) - 1

# representatives that stress every carry/borrow path: canonical edges,
# just-above-p, EPS multiples, and the top of the u64 range
BOUNDARY = [
    0, 1, 2, EPS - 1, EPS, EPS + 1, 1 << 32,
    P - EPS, P - 2, P - 1, P, P + 1, P + EPS - 1,  # P + EPS == 2^64
    U64_MAX - P, U64_MAX - EPS - 1, U64_MAX - EPS, U64_MAX - EPS + 1,
    U64_MAX - 1, U64_MAX,
]


def _pack(vals):
    # split by hand: numpy's pyint->uint64 conversion overflows via C long
    lo = np.array([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    hi = np.array([v >> 32 for v in vals], dtype=np.uint32)
    return lo, hi


def _unpack(fp):
    return [int(v) for v in fd.unpack_np(fp).ravel()]


def test_add_lazy_boundary():
    """add_lazy must be correct for ALL u64 representative pairs, including
    a+b >= 2^64+p where the EPS fold itself carries (the bug class: a=b=
    2^64-1 used to return 2^32-3 instead of 2^33-4 mod-p-equivalent)."""
    pairs = list(itertools.product(BOUNDARY, BOUNDARY))
    a = _pack([p[0] for p in pairs])
    b = _pack([p[1] for p in pairs])
    got = _unpack(fd.add_lazy(a, b))
    for (x, y), g in zip(pairs, got):
        assert g < 1 << 64
        assert g % P == (x + y) % P, f"add_lazy({x}, {y})"


def test_sub_lazy_boundary():
    pairs = list(itertools.product(BOUNDARY, BOUNDARY))
    a = _pack([p[0] for p in pairs])
    b = _pack([p[1] for p in pairs])
    got = _unpack(fd.sub_lazy(a, b))
    for (x, y), g in zip(pairs, got):
        assert g < 1 << 64
        assert g % P == (x - y) % P, f"sub_lazy({x}, {y})"


def test_mul_lazy_boundary():
    pairs = list(itertools.product(BOUNDARY, BOUNDARY))
    a = _pack([p[0] for p in pairs])
    b = _pack([p[1] for p in pairs])
    got = _unpack(fd.mul_lazy(a, b))
    for (x, y), g in zip(pairs, got):
        assert g < 1 << 64
        assert g % P == (x * y) % P, f"mul_lazy({x}, {y})"


def test_lazy_ops_random():
    n = 4096
    a_v = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    b_v = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    a, b = _pack(a_v), _pack(b_v)
    add = np.array(_unpack(fd.add_lazy(a, b)), dtype=object)
    sub = np.array(_unpack(fd.sub_lazy(a, b)), dtype=object)
    mul = np.array(_unpack(fd.mul_lazy(a, b)), dtype=object)
    canon = np.array(_unpack(fd.canonicalize(a)), dtype=object)
    for i in range(n):
        x, y = int(a_v[i]), int(b_v[i])
        assert int(add[i]) % P == (x + y) % P
        assert int(sub[i]) % P == (x - y) % P
        assert int(mul[i]) % P == (x * y) % P
        assert int(canon[i]) == x % P


# ---------------------------------------------------------------------------
# col_ntt kernel (interpret mode) vs exact Python oracle
# ---------------------------------------------------------------------------

def _py_ntt(col, root):
    """O(n log n) recursive radix-2 NTT with Python ints (exact oracle)."""
    n = len(col)
    if n == 1:
        return list(col)
    even = _py_ntt(col[0::2], root * root % P)
    odd = _py_ntt(col[1::2], root * root % P)
    out = [0] * n
    w = 1
    for k in range(n // 2):
        t = w * odd[k] % P
        out[k] = (even[k] + t) % P
        out[k + n // 2] = (even[k] - t) % P
        w = w * root % P
    return out


def _col_ntt_oracle(x_nat, root):
    """Per-column NTT of natural-order input (n1, n2) -> natural order."""
    n1, n2 = x_nat.shape
    out = np.zeros((n1, n2), dtype=object)
    for j in range(n2):
        out[:, j] = _py_ntt([int(v) for v in x_nat[:, j]], root)
    return out


def _bitrev_rows(x):
    return x[np.asarray(ntt.bit_reverse_indices(x.shape[0]))]


@pytest.mark.parametrize("unrolled", [True, False])
@pytest.mark.parametrize("n1", [8, 32])
def test_col_ntt_interpret(n1, unrolled, no_persistent_cache):
    n2 = 8
    root = pow(GENERATOR, (P - 1) // n1, P)
    x_nat = RNG.integers(0, P, size=(n1, n2), dtype=np.uint64)
    want = _col_ntt_oracle(x_nat, root)
    tw = ntt_pallas.stage_twiddles(root, n1)
    x = fd.pack_np(_bitrev_rows(x_nat))
    got = fd.unpack_np(ntt_pallas.col_ntt(
        x, tuple(map(np.asarray, tw)), interpret=True, unrolled=unrolled))
    assert [int(v) for v in got.ravel()] == [int(v) for v in want.ravel()]


@pytest.mark.parametrize("unrolled", [True, False])
def test_col_ntt_tmat_interpret(unrolled, no_persistent_cache):
    """Six-step epilogue fold: output * tmat elementwise."""
    n1, n2 = 16, 8
    root = pow(GENERATOR, (P - 1) // n1, P)
    x_nat = RNG.integers(0, P, size=(n1, n2), dtype=np.uint64)
    tmat_v = RNG.integers(0, P, size=(n1, n2), dtype=np.uint64)
    want = _col_ntt_oracle(x_nat, root)
    for i in range(n1):
        for j in range(n2):
            want[i, j] = int(want[i, j]) * int(tmat_v[i, j]) % P
    tw = ntt_pallas.stage_twiddles(root, n1)
    got = fd.unpack_np(ntt_pallas.col_ntt(
        fd.pack_np(_bitrev_rows(x_nat)), tuple(map(np.asarray, tw)),
        tmat=fd.pack_np(tmat_v), interpret=True, unrolled=unrolled))
    assert [int(v) for v in got.ravel()] == [int(v) for v in want.ravel()]


def test_col_ntt_pre_lazy_chain_interpret(no_persistent_cache):
    """The exact prover configuration: first kernel with `pre` (coset scale)
    + canon=False emitting representatives, chained into a second kernel
    whose arithmetic accepts representatives (as _ntt_sixstep_pallas_fp
    wires them)."""
    n1, n2 = 16, 16
    root = pow(GENERATOR, (P - 1) // n1, P)
    x_nat = RNG.integers(0, P, size=(n1, n2), dtype=np.uint64)
    pre_v = RNG.integers(0, P, size=(n1, n2), dtype=np.uint64)
    # oracle: NTT over rows of (pre * x) per column
    scaled = np.zeros((n1, n2), dtype=object)
    for i in range(n1):
        for j in range(n2):
            scaled[i, j] = int(x_nat[i, j]) * int(pre_v[i, j]) % P
    want = _col_ntt_oracle(scaled, root)

    tw = ntt_pallas.stage_twiddles(root, n1)
    # `pre` is applied AFTER the input bit-reversal in the pipeline, so the
    # kernel's pre matrix rows must be bit-reversed to line up
    rep = ntt_pallas.col_ntt(
        fd.pack_np(_bitrev_rows(x_nat)), tuple(map(np.asarray, tw)),
        pre=fd.pack_np(_bitrev_rows(pre_v)),
        interpret=True, unrolled=True, canon=False)
    got_rep = fd.unpack_np(rep)
    for i in range(n1):
        for j in range(n2):
            assert int(got_rep[i, j]) % P == int(want[i, j])

    # chain: feed the representatives (NOT canonicalized) into a second
    # kernel and check the result is still exact
    n1b = n1
    rootb = pow(GENERATOR, (P - 1) // n1b, P)
    want2 = _col_ntt_oracle(want, rootb)
    twb = ntt_pallas.stage_twiddles(rootb, n1b)
    rep_brv = (np.asarray(rep[0])[np.asarray(ntt.bit_reverse_indices(n1b))],
               np.asarray(rep[1])[np.asarray(ntt.bit_reverse_indices(n1b))])
    got2 = fd.unpack_np(ntt_pallas.col_ntt(
        rep_brv, tuple(map(np.asarray, twb)), interpret=True, unrolled=True))
    assert [int(v) for v in got2.ravel()] == [int(v) for v in want2.ravel()]


# ---------------------------------------------------------------------------
# full six-step pipelines at n >= 2^14: XLA branch (CPU default) and the
# Pallas branch in interpret mode
# ---------------------------------------------------------------------------

def _spot_check_fft(dom, coeffs, evals, idxs):
    for i in idxs:
        x = dom.element(i).v
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % P
        assert evals[i] == acc, f"eval mismatch at {i}"


@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_xla_sixstep_branch(offset):
    """n = 2^14 on CPU exercises ntt._ntt_core's XLA six-step branch (the
    fallback used under SPMD on every backend)."""
    n = 1 << 14
    coeffs_v = RNG.integers(0, P, size=n, dtype=np.uint64)
    coeffs = [int(v) for v in coeffs_v]
    dom = ntt.Domain(n, offset)
    evals_dev = dom.fft_fp(fd.pack_np(coeffs_v))
    evals = _unpack(evals_dev)
    # full-length oracle: one radix-2 python NTT of the scaled coefficients
    root = dom.group_gen
    scaled = [c * pow(offset, i, P) % P for i, c in enumerate(coeffs)] \
        if offset != 1 else coeffs
    want = _py_ntt(scaled, root)
    assert evals == want
    # roundtrip through the inverse branch
    back = _unpack(dom.ifft_fp(evals_dev))
    assert back == coeffs


@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_pallas_sixstep_pipeline_interpret(offset, monkeypatch,
                                           no_persistent_cache):
    """Runs ntt._ntt_sixstep_pallas_fp — the default TPU prover path — in
    interpret mode at n = 2^14 (n1 = n2 = 128) and checks it against the
    XLA branch on identical inputs, fwd + inv."""
    n = 1 << 14
    orig_col_ntt = ntt_pallas.col_ntt
    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: True)
    monkeypatch.setattr(ntt_pallas, "col_ntt",
                        functools.partial(orig_col_ntt, interpret=True))

    coeffs_v = RNG.integers(0, P, size=n, dtype=np.uint64)
    dom = ntt.Domain(n, offset)
    evals = dom._fft_fp_impl(fd.pack_np(coeffs_v), dom._fwd_tbl(),
                             dom._scale_tbl(), dom._fwd_tmat(),
                             dom._scale_brv_tbl())
    back = dom._ifft_fp_impl(evals, dom._inv_tbl(), dom._unscale_tbl(),
                             dom._inv_tmat(), dom._ipost_tbl())
    assert _unpack(back) == [int(v) for v in coeffs_v]

    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: False)
    want = dom._fft_fp_impl(fd.pack_np(coeffs_v), dom._fwd_tbl(),
                            dom._scale_tbl(), dom._fwd_tmat(),
                            dom._scale_brv_tbl())
    assert _unpack(evals) == _unpack(want)
    _spot_check_fft(dom, [int(v) for v in coeffs_v], _unpack(want),
                    [0, 1, 12345, n - 1])


@pytest.mark.parametrize("offset", [1, GENERATOR])
def test_pallas_sixstep_batched_interpret(offset, monkeypatch,
                                          no_persistent_cache):
    """Batched columns through ONE fused pipeline (ncols folded into the
    kernels' lane axis with per-column twiddle cycling) must match the XLA
    branch column-for-column — fwd and inv, Fp and ext3."""
    n = 1 << 14
    ncols = 3
    orig_col_ntt = ntt_pallas.col_ntt
    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: True)
    monkeypatch.setattr(ntt_pallas, "col_ntt",
                        functools.partial(orig_col_ntt, interpret=True))

    cols_v = RNG.integers(0, P, size=(ncols, n), dtype=np.uint64)
    dom = ntt.Domain(n, offset)
    evals = dom._fft_fp_impl(fd.pack_np(cols_v), dom._fwd_tbl(),
                             dom._scale_tbl(), dom._fwd_tmat(),
                             dom._scale_brv_tbl())
    back = dom._ifft_fp_impl(evals, dom._inv_tbl(), dom._unscale_tbl(),
                             dom._inv_tmat(), dom._ipost_tbl())
    assert np.array_equal(np.asarray(back[0]), np.asarray(fd.pack_np(cols_v)[0]))
    assert np.array_equal(np.asarray(back[1]), np.asarray(fd.pack_np(cols_v)[1]))

    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: False)
    want = dom._fft_fp_impl(fd.pack_np(cols_v), dom._fwd_tbl(),
                            dom._scale_tbl(), dom._fwd_tmat(),
                            dom._scale_brv_tbl())
    assert np.array_equal(np.asarray(evals[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(evals[1]), np.asarray(want[1]))


def test_pallas_sixstep_batched_ext3_interpret(monkeypatch,
                                               no_persistent_cache):
    """Ext3 components and columns both fold into one batched pipeline."""
    n = 1 << 14
    ncols = 2
    orig_col_ntt = ntt_pallas.col_ntt
    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: True)
    monkeypatch.setattr(ntt_pallas, "col_ntt",
                        functools.partial(orig_col_ntt, interpret=True))

    comps_v = RNG.integers(0, P, size=(3, ncols, n), dtype=np.uint64)
    x = tuple(fd.pack_np(comps_v[k]) for k in range(3))
    dom = ntt.Domain(n, GENERATOR)
    evals = dom._fft_ext3_impl(x, dom._fwd_tbl(), dom._scale_tbl(),
                               dom._fwd_tmat(), dom._scale_brv_tbl())

    monkeypatch.setattr(ntt, "_use_pallas", lambda _n: False)
    want = dom._fft_ext3_impl(x, dom._fwd_tbl(), dom._scale_tbl(),
                              dom._fwd_tmat(), dom._scale_brv_tbl())
    for k in range(3):
        assert np.array_equal(np.asarray(evals[k][0]), np.asarray(want[k][0]))
        assert np.array_equal(np.asarray(evals[k][1]), np.asarray(want[k][1]))


def test_transpose_mid_interpret(no_persistent_cache):
    """Tiled Pallas transpose vs numpy, incl. the batched layout."""
    import numpy as np
    import jax.numpy as jnp

    from ministark_tpu.ops import transpose_pallas

    rng = np.random.default_rng(0)
    for (R, B, C) in [(128, 1, 256), (256, 3, 128), (512, 2, 384)]:
        a = rng.integers(0, 2**32, (R, B * C), dtype=np.uint64).astype(np.uint32)
        b = rng.integers(0, 2**32, (R, B * C), dtype=np.uint64).astype(np.uint32)
        oa, ob = transpose_pallas.transpose_mid(
            jnp.asarray(a), jnp.asarray(b), B=B, interpret=True)
        want_a = a.reshape(R, B, C).transpose(2, 1, 0).reshape(C, B * R)
        want_b = b.reshape(R, B, C).transpose(2, 1, 0).reshape(C, B * R)
        assert np.array_equal(np.asarray(oa), want_a), (R, B, C)
        assert np.array_equal(np.asarray(ob), want_b), (R, B, C)
