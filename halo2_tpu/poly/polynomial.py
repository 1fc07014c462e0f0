"""Polynomial rotation over device arrays.

Reference: halo2_proofs/src/poly.rs:33-323. The reference's
`Polynomial<F, B>` phantom-basis wrapper is deliberately NOT mirrored: on
TPU a polynomial is a raw Montgomery-form uint32 [n, 16] array so it can
flow through jit/shard_map boundaries without unwrap/rewrap; basis
discipline lives in the EvaluationDomain method names
(lagrange_to_coeff / coeff_to_extended / ...), whose input/output bases
are part of their contracts. Rotation is `jnp.roll` (an index shift,
never a copy of rotated data into the expression graph — matching the
reference's no-materialization design, poly.rs:236-285).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


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
