"""Basis-tagged device polynomials + rotation.

Reference: halo2_proofs/src/poly.rs:33-323 (`Polynomial<F, B>` with phantom
basis Coeff / LagrangeCoeff / ExtendedLagrangeCoeff; `Rotation(i32)`).
On TPU a polynomial is a Montgomery-form uint32 [n, 16] array; rotation is
`jnp.roll` (an index shift, never a copy of rotated data into the
expression graph — matching the reference's no-materialization design,
poly.rs:236-285).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

COEFF = "coeff"
LAGRANGE = "lagrange"
EXTENDED = "extended"


@dataclass
class Poly:
    values: jnp.ndarray  # [n, 16] mont
    basis: str

    def __len__(self):
        return self.values.shape[0]


@dataclass(frozen=True)
class Rotation:
    """Query offset in ω-steps: cur=0, prev=-1, next=1
    (poly.rs:305-323)."""
    value: int = 0

    @staticmethod
    def cur() -> "Rotation":
        return Rotation(0)

    @staticmethod
    def prev() -> "Rotation":
        return Rotation(-1)

    @staticmethod
    def next() -> "Rotation":
        return Rotation(1)


def rotate(values: jnp.ndarray, rotation: int) -> jnp.ndarray:
    """Rotate a Lagrange evaluation vector: index i -> value at ω^(i+rot).
    (Polynomial::rotate, poly.rs:196-234: rotate_left for positive.)"""
    return jnp.roll(values, -rotation, axis=0)
