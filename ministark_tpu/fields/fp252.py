"""The 252-bit StarkWare/Cairo prime field (host scalar).

Parity with the reference's second field family (gpu/src/fields.rs:239-268,
gpu/src/metal/felt_u256.h.metal): modulus 2^251 + 17*2^192 + 1, generator 3.
Device (limb-vector) support is tracked for a later round; the protocol layer
is field-generic at the scalar level."""

from __future__ import annotations

P252 = 2**251 + 17 * 2**192 + 1
GENERATOR252 = 3
TWO_ADICITY252 = 192
TWO_ADIC_ROOT252 = pow(GENERATOR252, (P252 - 1) >> TWO_ADICITY252, P252)


class Fp252:
    __slots__ = ("v",)
    EXTENSION_DEGREE = 1
    NUM_BYTES = 32
    MODULUS = P252
    GENERATOR = GENERATOR252

    def __init__(self, v: int):
        self.v = v % P252

    def __add__(self, o):
        return Fp252(self.v + _val(o))

    __radd__ = __add__

    def __sub__(self, o):
        return Fp252(self.v - _val(o))

    def __rsub__(self, o):
        return Fp252(_val(o) - self.v)

    def __mul__(self, o):
        return Fp252(self.v * _val(o))

    __rmul__ = __mul__

    def __neg__(self):
        return Fp252(-self.v)

    def __truediv__(self, o):
        return self * Fp252(_val(o)).inverse()

    def __pow__(self, e: int):
        return Fp252(pow(self.v, e, P252))

    def pow(self, e: int):
        return self.__pow__(e)

    def inverse(self):
        if self.v == 0:
            raise ZeroDivisionError
        return Fp252(pow(self.v, P252 - 2, P252))

    def __eq__(self, o):
        if isinstance(o, Fp252):
            return self.v == o.v
        if isinstance(o, int):
            return self.v == o % P252
        return NotImplemented

    def __hash__(self):
        return hash(("Fp252", self.v))

    def __repr__(self):
        return f"Fp252({self.v})"

    def is_zero(self):
        return self.v == 0

    def to_bytes(self) -> bytes:
        return self.v.to_bytes(32, "little")

    @staticmethod
    def from_bytes(b: bytes) -> "Fp252":
        return Fp252(int.from_bytes(b, "little"))

    @staticmethod
    def zero():
        return Fp252(0)

    @staticmethod
    def one():
        return Fp252(1)


def _val(o) -> int:
    if isinstance(o, Fp252):
        return o.v
    if isinstance(o, int):
        return o
    raise TypeError(type(o))
