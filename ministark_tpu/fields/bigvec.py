"""Device-side generic big prime fields: 16-bit-limb Montgomery vectors.

TPU-native counterpart of the reference's generic Metal Montgomery field
template (gpu/src/metal/felt_u128.h.metal:105-192 over a hand-rolled u128,
felt_u256.h.metal + u256.h.metal for the 252-bit StarkWare prime).  The
reference instantiates it for

  * Fp128 — the "STARK Anatomy" prime 1 + 407*2^119
    (felt_u128.h.metal:186-191), and
  * Fp252 — the StarkWare/Cairo prime 2^251 + 17*2^192 + 1
    (felt_u256.h.metal, gpu/src/fields.rs:239-268).

Here a field-element array is a single ``uint32`` array of shape
``(L, *batch)``: limb ``k`` holds bits ``[16k, 16k+16)`` of the value, and
every limb stays ``< 2^16`` between ops.  All arithmetic is pure ``jnp``
uint32 (no 64-bit ints), so these functions run in plain jitted JAX *and*
inside Pallas TPU kernels — the same property ``fields/device.py`` has for
Goldilocks.  The 16/32-bit split is chosen because a product of two 16-bit
limbs plus two 16-bit addends fits *exactly* in uint32, which makes the
textbook CIOS Montgomery multiply carry-safe with no wider accumulator.

Unlike the Goldilocks device field (canonical values — see
fields/device.py), values here are stored in **Montgomery form**
(``v*R mod p``, ``R = 2^(16L)``): a generic canonical multiply would need a
second reduction pass per op.  The form never escapes the device: ``pack``
and ``unpack`` convert at the host boundary with exact bigint math, so the
protocol layer — like the proofs themselves — only ever sees canonical
values (src/hash.rs:92-100 serializes canonical LE bytes).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


class BigField:
    """A prime field instance: modulus, limb decomposition, Montgomery
    constants, and vectorized ops. ``L`` limbs of 16 bits each."""

    def __init__(self, name: str, modulus: int, generator: int,
                 two_adicity: int):
        assert modulus % 2 == 1
        self.name = name
        self.p = modulus
        self.generator = generator
        self.two_adicity = two_adicity
        self.L = -(-modulus.bit_length() // 16)
        self.R = 1 << (16 * self.L)
        assert self.R > modulus
        self.R_inv = pow(self.R, -1, modulus)
        # -p^-1 mod 2^16 (the CIOS "n0 prime")
        self.n0inv = np.uint32((-pow(modulus, -1, 1 << 16)) % (1 << 16))
        self.p_limbs = self._split_np(modulus)
        self.two_adic_root = pow(generator, (modulus - 1) >> two_adicity,
                                 modulus)

    # -- host <-> device -----------------------------------------------------

    def _split_np(self, v: int) -> np.ndarray:
        return np.array([(v >> (16 * k)) & 0xFFFF for k in range(self.L)],
                        dtype=np.uint32)

    def pack(self, values) -> np.ndarray:
        """Canonical python ints -> (L, n) uint32 Montgomery limb array."""
        vals = [(int(v) % self.p) * self.R % self.p for v in values]
        out = np.empty((self.L, len(vals)), dtype=np.uint32)
        for i, v in enumerate(vals):
            for k in range(self.L):
                out[k, i] = (v >> (16 * k)) & 0xFFFF
        return out

    def pack_scalar(self, value: int) -> np.ndarray:
        """One canonical value -> (L,) Montgomery limbs."""
        return self.pack([value])[:, 0]

    def unpack(self, limbs) -> list[int]:
        """(L, n) Montgomery limb array -> canonical python ints."""
        a = np.asarray(limbs, dtype=np.uint64)
        flat = a.reshape(self.L, -1)
        out = []
        for i in range(flat.shape[1]):
            v = 0
            for k in range(self.L - 1, -1, -1):
                v = (v << 16) | int(flat[k, i])
            out.append(v * self.R_inv % self.p)
        return out

    # -- device ops (uint32 jnp; Pallas-safe) ---------------------------------

    def zeros(self, shape) -> jnp.ndarray:
        return jnp.zeros((self.L, *shape), U32)

    def ones(self, shape) -> jnp.ndarray:
        """Montgomery ONE = R mod p, broadcast to shape."""
        one = self.pack_scalar(1)
        return jnp.broadcast_to(
            jnp.asarray(one)[(...,) + (None,) * len(shape)],
            (self.L, *shape)).astype(U32)

    def add(self, a, b):
        L = self.L
        t = []
        c = jnp.zeros_like(a[0])
        for j in range(L):
            s = a[j] + b[j] + c
            t.append(s & MASK16)
            c = s >> 16
        return self._cond_sub_p(t, c)

    def sub(self, a, b):
        L = self.L
        t = []
        brw = jnp.zeros_like(a[0])
        for j in range(L):
            s = a[j] - b[j] - brw
            t.append(s & MASK16)
            brw = (s >> 16) & np.uint32(1)  # 0 or 1 (borrow propagates as 0xffff)
        # add p back where we borrowed
        c = jnp.zeros_like(brw)
        out = []
        addp = brw  # 1 where underflow
        for j in range(L):
            s = t[j] + self.p_limbs[j] * addp + c
            out.append(s & MASK16)
            c = s >> 16
        return jnp.stack(out)

    def neg(self, a):
        return self.sub(self.zeros(a.shape[1:]), a)

    def is_zero(self, a):
        z = a[0]
        for j in range(1, self.L):
            z = z | a[j]
        return z == 0

    def _cond_sub_p(self, t: list, overflow):
        """t (list of L u32 limbs) + overflow*2^(16L) -> reduced mod p,
        assuming the value is < 2p."""
        d = []
        brw = jnp.zeros_like(t[0])
        for j in range(self.L):
            s = t[j] - self.p_limbs[j] - brw
            d.append(s & MASK16)
            brw = (s >> 16) & np.uint32(1)
        use_d = (overflow | (1 - brw)).astype(bool)  # t >= p
        return jnp.stack([jnp.where(use_d, d[j], t[j]) for j in range(self.L)])

    def mul(self, a, b):
        """Montgomery CIOS multiply: returns a*b*R^-1 with both inputs and
        the output in Montgomery form (so canonical values map to canonical
        products).  16-bit words, uint32 accumulation — each partial
        ``t + a_j*b_i + c`` is <= 2^32 - 1 exactly, so no carry is lost."""
        L = self.L
        zero = jnp.zeros_like(a[0] + b[0])
        t = [zero] * (L + 2)
        for i in range(L):
            bi = b[i]
            c = zero
            for j in range(L):
                s = t[j] + a[j] * bi + c
                t[j] = s & MASK16
                c = s >> 16
            s = t[L] + c
            t[L] = s & MASK16
            t[L + 1] = t[L + 1] + (s >> 16)

            m = (t[0] * self.n0inv) & MASK16
            s = t[0] + m * self.p_limbs[0]
            c = s >> 16
            for j in range(1, L):
                s = t[j] + m * self.p_limbs[j] + c
                t[j - 1] = s & MASK16
                c = s >> 16
            s = t[L] + c
            t[L - 1] = s & MASK16
            t[L] = t[L + 1] + (s >> 16)
            t[L + 1] = zero
        return self._cond_sub_p(t[:L], t[L])

    def square(self, a):
        return self.mul(a, a)

    def pow(self, a, e: int):
        """a^e for a static python-int exponent (square-and-multiply)."""
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.square(base)
        if result is None:
            return self.ones(a.shape[1:])
        return result

    def inverse(self, a):
        """Elementwise inverse by Fermat (undefined at 0)."""
        return self.pow(a, self.p - 2)

    def batch_inverse(self, a):
        """Montgomery-trick batch inverse along the last axis (one Fermat
        inversion total).  Zeros are NOT tolerated."""
        n = a.shape[-1]
        if n == 1:
            return self.inverse(a)
        # prefix products p_k = a_0 * ... * a_k (host loop over n is fine for
        # small n; large-n callers should use log-depth passes)
        prefetch = [a[..., 0]]
        for k in range(1, n):
            prefetch.append(self.mul(prefetch[-1], a[..., k]))
        inv_all = self.inverse(prefetch[-1])
        out = [None] * n
        for k in range(n - 1, 0, -1):
            out[k] = self.mul(inv_all, prefetch[k - 1])
            inv_all = self.mul(inv_all, a[..., k])
        out[0] = inv_all
        return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# NTT over a BigField (radix-2, natural order in/out)
# ---------------------------------------------------------------------------

class BigDomain:
    """Radix-2 (coset) evaluation domain over a BigField: the counterpart of
    the reference's generic-field GPU FFT (gpu/src/plan.rs:378-463
    instantiated for the u128/u256 fields, gpu/benches/fft.rs Fp252 cases).

    Values in/out are (L, n) Montgomery limb arrays in natural order.
    """

    def __init__(self, field: BigField, size: int, offset: int = 1):
        assert size & (size - 1) == 0, "size must be a power of two"
        k = size.bit_length() - 1
        assert k <= field.two_adicity
        self.field = field
        self.size = size
        self.offset = offset % field.p
        self.group_gen = pow(field.two_adic_root,
                             1 << (field.two_adicity - k), field.p)
        self.group_gen_inv = pow(self.group_gen, -1, field.p)
        self.size_inv = pow(size, -1, field.p)

    def element(self, i: int) -> int:
        return self.offset * pow(self.group_gen, i, self.field.p) % self.field.p

    @functools.lru_cache(maxsize=None)
    def _stage_twiddles(self, inverse: bool):
        """Per-stage twiddle tables: stage s (m = 2^(s+1)) gets the (L, m/2)
        powers of root^(n/m), packed Montgomery."""
        f, n = self.field, self.size
        root = self.group_gen_inv if inverse else self.group_gen
        tabs = []
        m = 2
        while m <= n:
            wm = pow(root, n // m, f.p)
            w, ws = 1, []
            for _ in range(m // 2):
                ws.append(w)
                w = w * wm % f.p
            tabs.append(jnp.asarray(f.pack(ws)))
            m *= 2
        return tabs

    @functools.lru_cache(maxsize=None)
    def _scale_tbl(self, inverse: bool):
        f, n = self.field, self.size
        base = pow(self.offset, -1, f.p) if inverse else self.offset
        w, ws = 1, []
        for _ in range(n):
            ws.append(w if not inverse else w * self.size_inv % f.p)
            w = w * base % f.p
        return jnp.asarray(f.pack(ws))

    def _transform(self, x, inverse: bool):
        f, n = self.field, self.size
        assert x.shape == (f.L, n)
        if not inverse and self.offset != 1:
            x = f.mul(x, self._scale_tbl(False))
        # decimation-in-time: bit-reverse input, natural-order butterflies
        from ..ntt import bit_reverse_indices
        x = x[:, bit_reverse_indices(n)]
        for s, tw in enumerate(self._stage_twiddles(inverse)):
            m = 2 << s
            xr = x.reshape(f.L, n // m, m)
            u = xr[:, :, : m // 2]
            t = f.mul(xr[:, :, m // 2:], tw[:, None, :])
            x = jnp.concatenate([f.add(u, t), f.sub(u, t)], axis=2)
            x = x.reshape(f.L, n)
        if inverse:
            x = f.mul(x, self._scale_tbl(True))
        return x

    def fft(self, coeffs):
        return self._transform(coeffs, inverse=False)

    def ifft(self, evals):
        return self._transform(evals, inverse=True)

    def __hash__(self):
        return hash((self.field.name, self.size, self.offset))

    def __eq__(self, o):
        return (self.field is o.field and self.size == o.size
                and self.offset == o.offset)


# -- concrete instances (the reference's two big-field families) -------------

from .fp128 import GENERATOR128, P128, TWO_ADICITY128  # noqa: E402
from .fp252 import GENERATOR252, P252, TWO_ADICITY252  # noqa: E402

Fp128Vec = BigField("Fp128", P128, GENERATOR128, TWO_ADICITY128)
Fp252Vec = BigField("Fp252", P252, GENERATOR252, TWO_ADICITY252)
