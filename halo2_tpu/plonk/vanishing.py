"""Vanishing argument: random blinder + quotient h(X) commit/eval.

Reference: halo2_proofs/src/plonk/vanishing/prover.rs:38-152 and
verifier.rs:40-130. The h(X) pipeline — y-fold of all constraint arrays,
division by t(X) on the coset, iFFT, split into n-sized pieces — is the
single biggest device computation in the prover.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..fields.device import NLIMBS
from ..poly.utils import distribute_powers, eval_poly
from .circuit import ConstraintSystem


@dataclass
class VanishingCommitted:
    random_poly: jnp.ndarray
    random_blind: int


@dataclass
class VanishingConstructed:
    h_pieces: list[jnp.ndarray]
    h_blinds: list[int]
    committed: VanishingCommitted


def vanishing_commit(params, domain, rng, transcript) -> VanishingCommitted:
    """Random degree n-1 poly + blind (vanishing/prover.rs:38-60)."""
    df = params.scalar_df
    fs = params.curve.scalar
    vals = [fs.rand(rng) for _ in range(params.n)]
    random_poly = df.upload_values(vals)
    random_blind = fs.rand(rng)
    transcript.write_point(params.commit(random_poly, random_blind))
    return VanishingCommitted(random_poly=random_poly,
                              random_blind=random_blind)


def vanishing_construct(committed: VanishingCommitted, params, domain,
                        h_terms: list[jnp.ndarray], y: int, rng,
                        transcript) -> VanishingConstructed:
    """vanishing/prover.rs:65-121: y-fold, ÷t(X), iFFT, split, commit."""
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n

    from .prover import _PhaseTimer
    prof = _PhaseTimer(tag="vanishing")
    if not h_terms:
        # gate-less circuit: h(X) == 0 (DistributePowers of an empty
        # iterator is the zero constant)
        h_terms = [df.zeros((domain.extended_n,))]
    h = distribute_powers(df, h_terms, df.scalar(y))
    prof.lap("y-fold")
    h = domain.divide_by_vanishing_poly(h)
    prof.lap("divide")
    h_coeffs = domain.extended_to_coeff(h)
    prof.lap("ext->coeff")
    # truncate to n * quotient_poly_degree, split into n-sized pieces
    total = n * domain.quotient_poly_degree
    h_coeffs = h_coeffs[:total]
    h_pieces = [h_coeffs[i * n:(i + 1) * n]
                for i in range(domain.quotient_poly_degree)]
    h_blinds = [fs.rand(rng) for _ in h_pieces]
    for pt in params.commit_many(h_pieces, h_blinds, lagrange=False):
        transcript.write_point(pt)
    prof.lap("commit")
    return VanishingConstructed(h_pieces=h_pieces, h_blinds=h_blinds,
                                committed=committed)


def vanishing_evaluate(constructed: VanishingConstructed, params, x: int,
                       xn: int, transcript, eval_fn=None):
    """Fold pieces by xn (Horner over reversed pieces), write random_eval
    (vanishing/prover.rs:125-152). Returns (h_poly coeffs, h_blind)."""
    from ..fields.device import fadd, fmul
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n
    xn_m = df.scalar(xn)

    h_poly = None
    for piece in reversed(constructed.h_pieces):
        if h_poly is None:
            h_poly = piece
        else:
            h_poly = fadd(df, fmul(df, h_poly,
                                   jnp.broadcast_to(xn_m, h_poly.shape)),
                          piece)
    h_blind = 0
    for blind in reversed(constructed.h_blinds):
        h_blind = (h_blind * xn + blind) % fs.modulus

    if eval_fn is not None:
        random_eval = eval_fn(constructed.committed.random_poly, x)
    else:
        random_eval = int(df.from_mont_np(np.asarray(
            eval_poly(df, constructed.committed.random_poly,
                      df.scalar(x)))))
    transcript.write_scalar(random_eval)
    return h_poly, h_blind
