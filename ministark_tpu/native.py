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
