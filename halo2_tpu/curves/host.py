"""Host-side (Python int) Pasta curve arithmetic: Pallas and Vesta.

Pallas: y^2 = x^3 + 5 over Fp, scalar field Fq, generator (-1, 2).
Vesta:  y^2 = x^3 + 5 over Fq, scalar field Fp, generator (-1, 2).
(The curve cycle the reference proving system is instantiated over;
pasta_curves 0.5.1, re-exported at halo2_proofs/src/arithmetic.rs:10.)

Points are (x, y) int tuples or None for the identity. Used for
orchestration-scale work (transcript point hashing, tests, small verifier
algebra); all O(n) point work runs on device (curves/device.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

from ..fields.host import FP, FQ, FieldSpec

Point = tuple[int, int] | None  # affine; None = identity


@dataclass(frozen=True)
class CurveSpec:
    name: str
    base: FieldSpec     # coordinate field
    scalar: FieldSpec   # scalar field
    b: int = 5

    @property
    def generator(self) -> Point:
        return (self.base.modulus - 1, 2)

    def is_on_curve(self, pt: Point) -> bool:
        if pt is None:
            return True
        x, y = pt
        p = self.base.modulus
        return (y * y - (x * x * x + self.b)) % p == 0

    def add(self, a: Point, b: Point) -> Point:
        p = self.base.modulus
        if a is None:
            return b
        if b is None:
            return a
        x1, y1 = a
        x2, y2 = b
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            return self.double(a)
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
        x3 = (lam * lam - x1 - x2) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def double(self, a: Point) -> Point:
        if a is None:
            return None
        p = self.base.modulus
        x1, y1 = a
        if y1 == 0:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, -1, p) % p
        x3 = (lam * lam - 2 * x1) % p
        y3 = (lam * (x1 - x3) - y1) % p
        return (x3, y3)

    def neg(self, a: Point) -> Point:
        if a is None:
            return None
        return (a[0], (-a[1]) % self.base.modulus)

    def mul(self, a: Point, k: int) -> Point:
        k %= self.scalar.modulus
        acc: Point = None
        add = a
        while k:
            if k & 1:
                acc = self.add(acc, add)
            add = self.double(add)
            k >>= 1
        return acc

    def msm(self, scalars: list[int], points: list[Point]) -> Point:
        acc: Point = None
        for s, pt in zip(scalars, points):
            acc = self.add(acc, self.mul(pt, s))
        return acc

    # ---- compressed 32-byte encoding (pasta_curves format) ----
    # x in 32 LE bytes; top bit of byte 31 = parity of y; identity = zeros.
    def to_bytes(self, pt: Point) -> bytes:
        if pt is None:
            return bytes(32)
        x, y = pt
        data = bytearray(self.base.to_repr(x))
        data[31] |= (y & 1) << 7
        return bytes(data)

    def from_bytes(self, data: bytes) -> Point | False:
        """Returns a Point (possibly None=identity) or False on invalid."""
        assert len(data) == 32
        buf = bytearray(data)
        ysign = (buf[31] >> 7) & 1
        buf[31] &= 0x7F
        x = self.base.from_repr(bytes(buf))
        if x is None:
            return False
        if x == 0 and ysign == 0 and all(v == 0 for v in buf):
            return None  # identity
        y2 = (x * x * x + self.b) % self.base.modulus
        y = self.base.sqrt(y2)
        if y is None:
            return False
        if (y & 1) != ysign:
            y = self.base.modulus - y
        return (x, y)


PALLAS = CurveSpec(name="pallas", base=FP, scalar=FQ)
VESTA = CurveSpec(name="vesta", base=FQ, scalar=FP)
