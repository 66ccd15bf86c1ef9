"""ctypes bindings for the native host runtime (native/ministark_native.cpp).

Builds the shared library on first use (g++, no external deps); every entry
point has a pure-Python fallback so the framework works without a compiler.
Used for host-side hot paths: PoW grinding, Merkle verification hashing,
batch scalar field ops in the verifier.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libministark_native.so")

_lib = None
_tried = False


def get_lib():
    """Returns the loaded library or None (fallback to Python)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gl_mul.restype = ctypes.c_uint64
        lib.gl_mul.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.gl_add.restype = ctypes.c_uint64
        lib.gl_add.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.gl_inv.restype = ctypes.c_uint64
        lib.gl_inv.argtypes = [ctypes.c_uint64]
        lib.gl_pow.restype = ctypes.c_uint64
        lib.gl_pow.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
        lib.sha256.restype = None
        lib.sha256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
        lib.sha256_merge.restype = None
        lib.sha256_merge.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
        lib.pow_grind.restype = ctypes.c_uint64
        lib.pow_grind.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
        lib.gl_horner.restype = ctypes.c_uint64
        lib.gl_horner.argtypes = [ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
                                  ctypes.c_uint64]
        lib.gl_batch_inv.restype = None
        lib.gl_batch_inv.argtypes = [ctypes.POINTER(ctypes.c_uint64),
                                     ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
        U64P = ctypes.POINTER(ctypes.c_uint64)
        lib.mk_verify_view.restype = ctypes.c_int
        lib.mk_verify_view.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, U64P, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t]
        lib.fri_fold_rows.restype = None
        lib.fri_fold_rows.argtypes = [
            U64P, ctypes.c_size_t, ctypes.c_uint32, U64P, ctypes.c_uint64,
            U64P, U64P]
        lib.deep_evals.restype = None
        lib.deep_evals.argtypes = [
            U64P, ctypes.c_size_t,
            ctypes.c_size_t, U64P, U64P, U64P, U64P,
            ctypes.c_size_t, U64P, U64P, U64P,
            U64P, U64P, U64P, U64P]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def pow_grind(seed: bytes, bits: int) -> int | None:
    """Native PoW grind; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.pow_grind(seed, bits))


def sha256(data: bytes) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.sha256(data, len(data), out)
    return out.raw


def gl_batch_inv(values: list[int]) -> list[int] | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(values)
    arr = (ctypes.c_uint64 * n)(*values)
    out = (ctypes.c_uint64 * n)()
    lib.gl_batch_inv(arr, out, n)
    return list(out)


def _u64_arr(vals):
    return (ctypes.c_uint64 * len(vals))(*vals)


def _fq3_flat(scalars) -> list[int]:
    """Flatten Fp/Fq3 scalars to (c0, c1, c2) canonical u64 triples."""
    out = []
    for s in scalars:
        if hasattr(s, "c0"):
            out.extend([s.c0.v, s.c1.v, s.c2.v])
        else:
            out.extend([s.v if hasattr(s, "v") else int(s), 0, 0])
    return out


def mk_verify_view(root: bytes, height: int, indices: list[int],
                   initial_leaves: list[bytes], sibling_leaves: list[bytes],
                   nodes: list[bytes]) -> int | None:
    """Native Merkle multi-proof check: 0 = valid, >0 = the python
    verify_view failure modes in order; None if the lib is unavailable.
    `indices` must be sorted unique and len == len(initial_leaves)."""
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.mk_verify_view(
        root, height, _u64_arr(indices), len(indices),
        b"".join(initial_leaves), b"".join(sibling_leaves),
        len(sibling_leaves), b"".join(nodes), len(nodes)))


def fri_fold_rows(rows_flat: list, N: int, offsets: list[int], w: int,
                  alpha) -> list[tuple[int, int, int]] | None:
    """Native FRI next-layer evals; rows_flat = n*N Fq/Fp scalars (row-major).
    Returns n (c0, c1, c2) triples, or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(rows_flat) // N
    out = (ctypes.c_uint64 * (3 * n))()
    lib.fri_fold_rows(_u64_arr(_fq3_flat(rows_flat)), n, N,
                      _u64_arr(offsets), w, _u64_arr(_fq3_flat([alpha])), out)
    return [(out[3 * i], out[3 * i + 1], out[3 * i + 2]) for i in range(n)]


def deep_evals(xs: list[int], n_args: int, trace_vals: list, oods: list,
               alphas: list, zshifts: list, n_comp: int, comp_vals: list,
               coods: list, betas: list, zn, da, db):
    """Native DEEP quotient evaluations; returns n (c0,c1,c2) triples or
    None.  trace_vals/comp_vals are row-major scalar lists."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(xs)
    out = (ctypes.c_uint64 * (3 * n))()
    lib.deep_evals(
        _u64_arr(xs), n,
        n_args, _u64_arr(_fq3_flat(trace_vals)), _u64_arr(_fq3_flat(oods)),
        _u64_arr(_fq3_flat(alphas)), _u64_arr(_fq3_flat(zshifts)),
        n_comp, _u64_arr(_fq3_flat(comp_vals)), _u64_arr(_fq3_flat(coods)),
        _u64_arr(_fq3_flat(betas)),
        _u64_arr(_fq3_flat([zn])), _u64_arr(_fq3_flat([da])),
        _u64_arr(_fq3_flat([db])), out)
    return [(out[3 * i], out[3 * i + 1], out[3 * i + 2]) for i in range(n)]
