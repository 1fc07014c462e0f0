"""Verifying and proving keys.

Reference: halo2_proofs/src/plonk.rs:41-141. The vk's transcript_repr
binds the full pinned verification key (both moduli, pinned domain, pinned
constraint system, fixed and permutation commitments) into every proof
transcript via BLAKE2b-512 with personalization b"Halo2-Verify-Key"
(plonk.rs:56-101). The pinned text format here is a canonical rendering of
the same data (the reference hashes a Rust Debug string; byte parity of
that string is tracked in PARITY.md)."""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import jax.numpy as jnp

from ..curves.host import CurveSpec, Point
from ..poly.domain import EvaluationDomain
from .circuit import ConstraintSystem
from .permutation import PermutationProvingKey


@dataclass
class VerifyingKey:
    curve: CurveSpec
    domain: EvaluationDomain
    fixed_commitments: list[Point]
    permutation_commitments: list[Point]
    cs: ConstraintSystem
    cs_degree: int
    selectors: list[list[bool]] = field(default_factory=list)

    def pinned_text(self) -> str:
        """Canonical text of the pinned verification key
        (PinnedVerificationKey, plonk.rs:105-128)."""
        lines = []
        lines.append(f"base_modulus: {hex(self.curve.base.modulus)}")
        lines.append(f"scalar_modulus: {hex(self.curve.scalar.modulus)}")
        d = self.domain.pinned()
        lines.append(f"domain: k={d['k']} extended_k={d['extended_k']} "
                     f"omega={hex(d['omega'])}")
        cs = self.cs
        lines.append(f"num_fixed_columns: {cs.num_fixed_columns}")
        lines.append(f"num_advice_columns: {cs.num_advice_columns}")
        lines.append(f"num_instance_columns: {cs.num_instance_columns}")
        lines.append(f"num_selectors: {cs.num_selectors}")
        for g in cs.gates:
            for p in g.polys:
                lines.append(f"gate: {p!r}")
        lines.append(f"advice_queries: {cs.advice_queries!r}")
        lines.append(f"instance_queries: {cs.instance_queries!r}")
        lines.append(f"fixed_queries: {cs.fixed_queries!r}")
        lines.append(f"permutation_columns: {cs.permutation.columns!r}")
        for lk in cs.lookups:
            lines.append(f"lookup: in={lk.input_expressions!r} "
                         f"table={lk.table_expressions!r}")
        lines.append(f"constants: {cs.constants!r}")
        lines.append(f"minimum_degree: {cs.minimum_degree!r}")
        for c in self.fixed_commitments:
            lines.append(f"fixed_commitment: {self.curve.to_bytes(c).hex()}")
        for c in self.permutation_commitments:
            lines.append(
                f"permutation_commitment: {self.curve.to_bytes(c).hex()}")
        return "\n".join(lines)

    def transcript_repr(self) -> int:
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        text = self.pinned_text()
        h.update(f"halo2-tpu verify key with s={len(text)}:".encode())
        h.update(text.encode())
        return self.curve.scalar.from_uniform_bytes(h.digest())

    def hash_into(self, transcript) -> None:
        """plonk.rs:94-101."""
        transcript.common_scalar(self.transcript_repr())


@dataclass
class ProvingKey:
    vk: VerifyingKey
    l0: jnp.ndarray            # extended basis
    l_blind: jnp.ndarray
    l_last: jnp.ndarray
    l_active_row_info: tuple   # (blinding_factors,)
    fixed_values: list         # Lagrange device arrays
    fixed_polys: list          # coeff device arrays
    fixed_cosets: list         # extended device arrays
    permutation: PermutationProvingKey
