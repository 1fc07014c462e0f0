"""Selector materialization into fixed columns.

Reference: halo2_proofs/src/plonk/circuit/compress_selectors.rs packs
mutually-exclusive simple selectors into shared fixed columns via an
exclusion-matrix greedy combine under the gate degree bound, with an
interpolated substitution expression.

This round implements the *direct* materialization path (the degree-0 /
complex-selector case of the reference algorithm, compress_selectors.rs:
51-96): every selector becomes its own fixed column with 0/1 values and the
substitution expression is a plain fixed query. This is sound and
self-consistent; the packing optimisation (which only shrinks the number of
fixed columns, changing the vk layout) is tracked in PARITY.md.
"""
from __future__ import annotations

from .circuit import (ConstraintSystem, Column, Expression, SelectorExpr,
                      FixedQuery, Negated, Sum, Product, Scaled, Constant,
                      Gate, FIXED)
from ..poly.polynomial import Rotation


def replace_selectors(expr: Expression, replacements: dict) -> Expression:
    """Substitute Selector leaves by their replacement expressions."""
    if isinstance(expr, SelectorExpr):
        return replacements[expr.selector.index]
    if isinstance(expr, Negated):
        return Negated(replace_selectors(expr.expr, replacements))
    if isinstance(expr, Sum):
        return Sum(replace_selectors(expr.a, replacements),
                   replace_selectors(expr.b, replacements))
    if isinstance(expr, Product):
        return Product(replace_selectors(expr.a, replacements),
                       replace_selectors(expr.b, replacements))
    if isinstance(expr, Scaled):
        return Scaled(replace_selectors(expr.expr, replacements),
                      expr.scalar)
    return expr


def compress_selectors(cs: ConstraintSystem, selectors: list[list[bool]]
                       ) -> tuple[ConstraintSystem, list[list[int]]]:
    """Materialize selector assignments into fixed columns, rewriting every
    gate/lookup expression. Returns (mutated cs, new fixed column values as
    0/1 int rows). Mirrors ConstraintSystem::compress_selectors
    (plonk/circuit.rs:1237-1343) with direct per-selector columns."""
    assert len(selectors) == cs.num_selectors
    new_columns: list[list[int]] = []
    replacements: dict[int, Expression] = {}
    for sel_index, activations in enumerate(selectors):
        column = cs.fixed_column()
        cs.selector_map.append(column)
        query_index = cs.query_fixed_index(column, Rotation(0))
        replacements[sel_index] = FixedQuery(
            query_index=query_index, column_index=column.index,
            rotation=Rotation(0))
        new_columns.append([1 if b else 0 for b in activations])

    cs.gates = [
        Gate(name=g.name, constraint_names=g.constraint_names,
             polys=[replace_selectors(p, replacements) for p in g.polys],
             queried_selectors=[],
             queried_cells=g.queried_cells)
        for g in cs.gates]
    for lk in cs.lookups:
        lk.input_expressions = [replace_selectors(e, replacements)
                                for e in lk.input_expressions]
        lk.table_expressions = [replace_selectors(e, replacements)
                                for e in lk.table_expressions]
    return cs, new_columns
