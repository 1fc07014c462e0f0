"""Gate-expression evaluation as fused device programs.

TPU-native replacement for the reference's chunk-parallel AST evaluator
(halo2_proofs/src/poly/evaluator.rs:19-615): instead of walking an Ast per
chunk on a thread pool, each `Expression` is *traced* directly into XLA ops
over whole device arrays — XLA is the deferred-execution engine, fusing the
entire quotient computation into one compiled program. Rotations are
`jnp.roll` index shifts (rotation scale 2^(extended_k - k) on the extended
domain, matching rotate_extended, domain.rs:257-275); `LinearTerm` needs
the coset points ζ·ω_ext^i (BasisOps::linear_term, evaluator.rs:584-604).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.device import DeviceField, NLIMBS, fadd, fsub, fmul, fneg
from ..poly.domain import EvaluationDomain
from .circuit import Expression


def _rot(values: jnp.ndarray, rotation: int, scale: int) -> jnp.ndarray:
    if rotation == 0:
        return values
    return jnp.roll(values, -rotation * scale, axis=0)


def evaluate_expression(df: DeviceField, expr: Expression, *,
                        advice, fixed, instance,
                        rot_scale: int = 1,
                        selector_fn=None):
    """Evaluate one gate Expression over arrays (Lagrange basis when
    rot_scale == 1, extended-coset basis when rot_scale == 2^(ek-k)).
    `advice/fixed/instance` are lists of [N, 16] mont arrays. Constants
    stay [16] and broadcast through the limb ops."""

    if selector_fn is None:
        def selector_fn(s):
            raise RuntimeError(
                "virtual selectors are removed during optimization")

    return expr.evaluate(
        constant=lambda v: df.scalar(v),
        selector_fn=selector_fn,
        fixed_fn=lambda q: _rot(fixed[q.column_index], q.rotation.value,
                                rot_scale),
        advice_fn=lambda q: _rot(advice[q.column_index], q.rotation.value,
                                 rot_scale),
        instance_fn=lambda q: _rot(instance[q.column_index],
                                   q.rotation.value, rot_scale),
        negated=lambda a: fneg(df, a),
        sum_fn=lambda a, b: fadd(df, a, b),
        product=lambda a, b: fmul(df, a, b),
        scaled=lambda a, v: fmul(df, a, df.scalar(v)),
    )


def evaluate_expression_host(f, expr: Expression, *,
                             advice_evals, fixed_evals, instance_evals):
    """Evaluate an Expression on host scalars using the vk's query indices
    (the verifier path, plonk/verifier.rs:230-253)."""
    p = f.modulus
    return expr.evaluate(
        constant=lambda v: v % p,
        selector_fn=lambda s: (_ for _ in ()).throw(
            RuntimeError("virtual selectors are removed")),
        fixed_fn=lambda q: fixed_evals[q.query_index],
        advice_fn=lambda q: advice_evals[q.query_index],
        instance_fn=lambda q: instance_evals[q.query_index],
        negated=lambda a: (-a) % p,
        sum_fn=lambda a, b: (a + b) % p,
        product=lambda a, b: a * b % p,
        scaled=lambda a, v: a * v % p,
    )


def coset_points(domain: EvaluationDomain) -> jnp.ndarray:
    """[ζ·ω_ext^i] for the extended domain, Montgomery form — the
    'LinearTerm' basis array. Built on device: powers scan + scale."""
    from ..poly.utils import powers
    df = domain.df
    pw = powers(df, df.scalar(domain.extended_omega), domain.extended_n)
    zeta = df.scalar(domain.g_coset)
    return fmul(df, pw, jnp.broadcast_to(zeta, pw.shape))
