"""Device IPA tail: Pallas-kernel L/R MSMs + GLV-folded G' collapse.

Reference: halo2_proofs/src/poly/commitment/prover.rs:100-166 — per
round, two cross-term MSMs (L_j/R_j), two inner products, then the
collapse p' = p'_lo + u_j^-1 p'_hi, b = b_lo + u_j b_hi, and
G' = G'_lo + [u_j] G'_hi (`parallel_generator_collapse`).

TPU formulation (two fused dispatches per round):
  - L/R: both Pippenger window-sum programs + both inner products in
    one jit over the current halves; the host Horner-combines the
    window sums (tiny serial group math) and writes the transcript.
  - fold: u_j is a *host* scalar at fold time, so the G' collapse uses
    a GLV-split ladder — u_j = s1 + s2*λ with |s1|,|s2| ~ 2^128 and
    [λ]P = φ(P) = (ζ_p·x, y) (the curve endomorphism the native
    library also exploits, native/pasta.cc:698-777) — halving the
    ladder length: ~130 iterations of pdouble + select + masked-add on
    the complete-formula Pallas point kernels, with the split's bit
    arrays passed as runtime inputs (one compile per half size, not
    per scalar).

Group math is exact: results are bit-identical to the host path.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import DeviceField, NLIMBS, fadd, fmul, from_mont
from ..curves.host import CurveSpec
from . import msm_pallas as mp
from .pallas_point import (padd_flat, pdouble_flat, padd_masked_flat,
                           _ident_col_np, _interpret_default)
from ..poly.utils import inner_product

GLV_BITS = 130  # ceil(|q|/2) + slack for the decomposition bound


@functools.lru_cache(maxsize=None)
def _find_lambda(curve_name: str, q: int, zeta_q: int) -> int:
    """The scalar λ with [λ](x, y) = (ζ_p·x, y): ζ_q or ζ_q² depending
    on orientation — resolved empirically on the generator once."""
    from ..curves.host import PALLAS, VESTA
    spec = PALLAS if curve_name == PALLAS.name else VESTA
    gx, gy = spec.generator
    zp = spec.base.zeta
    phi = (zp * gx % spec.base.modulus, gy)
    for lam in (zeta_q, zeta_q * zeta_q % q):
        if spec.mul(spec.generator, lam) == phi:
            return lam
    raise AssertionError("no cube root matches the endomorphism")


@functools.lru_cache(maxsize=None)
def _glv_basis(q: int, lam: int):
    """Two short lattice vectors (a, b) with a + b·λ ≡ 0 (mod q), via
    the extended-Euclid half-GCD (GLV01, Alg. 3.74)."""
    r0, r1 = q, lam
    t0, t1 = 0, 1
    lim = math.isqrt(q)
    rows = [(r0, t0), (r1, t1)]
    while r1 >= lim:
        qt = r0 // r1
        r0, r1 = r1, r0 - qt * r1
        t0, t1 = t1, t0 - qt * t1
        rows.append((r1, t1))
    # rows[-1] is the first remainder < sqrt(q); candidates around it
    (rl, tl), (rm, tm) = rows[-1], rows[-2]
    v1 = (rl, -tl)
    # second vector: the shorter of rows[-2] and one more EEA step
    qt = rm // rl
    r2, t2 = rm - qt * rl, tm - qt * tl
    v2 = ((rm, -tm) if rm * rm + tm * tm <= r2 * r2 + t2 * t2
          else (r2, -t2))
    return v1, v2


def glv_split(spec_scalar, curve_name: str, u: int):
    """u -> (s1, neg1, s2, neg2) with u ≡ ±s1 ± s2·λ (mod q) and
    s1, s2 < 2^GLV_BITS."""
    q = spec_scalar.modulus
    lam = _find_lambda(curve_name, q, spec_scalar.zeta)
    (a1, b1), (a2, b2) = _glv_basis(q, lam)
    det = a1 * b2 - a2 * b1
    # round(u*b2/det), round(-u*b1/det) — exact rational rounding
    def rnd(num, den):
        if den < 0:
            num, den = -num, -den
        return (2 * num + den) // (2 * den)
    c1 = rnd(u * b2, det)
    c2 = rnd(-u * b1, det)
    u1 = u - c1 * a1 - c2 * a2
    u2 = -c1 * b1 - c2 * b2
    assert (u1 + u2 * lam - u) % q == 0
    s1, neg1 = (u1, 0) if u1 >= 0 else (-u1, 1)
    s2, neg2 = (u2, 0) if u2 >= 0 else (-u2, 1)
    assert s1 < (1 << GLV_BITS) and s2 < (1 << GLV_BITS), (s1, s2)
    return s1, neg1, s2, neg2


def _bits_msb(s: int, nb: int) -> np.ndarray:
    return np.array([(s >> (nb - 1 - i)) & 1 for i in range(nb)],
                    np.uint32)


# ---------------------------------------------------------------------------
# per-round dispatches
# ---------------------------------------------------------------------------

_LR_JIT: dict = {}
_FOLD_JIT: dict = {}


def ipa_round_lr(params, p_prime: jnp.ndarray, b: jnp.ndarray,
                 gproj: jnp.ndarray, half: int):
    """One dispatch: L/R window sums + both inner products. Returns
    (l_point, r_point, value_l, value_r) with points/values on host."""
    df = params.scalar_df
    dev = params.dev
    c = mp.pick_c(half)
    interpret = _interpret_default()
    key = (params.curve.name, half, c, interpret)
    fn = _LR_JIT.get(key)
    if fn is None:
        def impl(pp, bb, g):
            d_hi = from_mont(df, pp[half:])
            d_lo = from_mont(df, pp[:half])
            wl, _ = mp.msm_pallas_window_sums(
                params.curve, dev.base, d_hi, g[:, :half], c,
                interpret=interpret)
            wr, _ = mp.msm_pallas_window_sums(
                params.curve, dev.base, d_lo, g[:, half:2 * half], c,
                interpret=interpret)
            vl = inner_product(df, pp[half:], bb[:half])
            vr = inner_product(df, pp[:half], bb[half:])
            return wl, wr, jnp.stack([vl, vr])
        fn = jax.jit(impl)
        _LR_JIT[key] = fn
    wl, wr, vals = fn(p_prime, b, gproj)
    wl_np, wr_np, vals_np = (np.asarray(wl), np.asarray(wr),
                             np.asarray(vals))
    l_pt = mp.host_horner_combine(
        params.curve, mp.points_from_proj(params.curve, dev.base, wl_np), c)
    r_pt = mp.host_horner_combine(
        params.curve, mp.points_from_proj(params.curve, dev.base, wr_np), c)
    value_l, value_r = (int(v) for v in df.from_mont_np(vals_np))
    return l_pt, r_pt, value_l, value_r


def ipa_fold(params, p_prime: jnp.ndarray, b: jnp.ndarray,
             gproj: jnp.ndarray | None, half: int, u_j: int,
             u_j_inv: int):
    """One dispatch: p'/b folds + the GLV-ladder G' collapse. Pass
    gproj=None on the final round (no further L/R needs G'). Returns
    (p_prime', b', gproj')."""
    df = params.scalar_df
    dev = params.dev
    fs = params.curve.scalar
    interpret = _interpret_default()
    with_g = gproj is not None
    key = (params.curve.name, half, with_g, interpret)
    fn = _FOLD_JIT.get(key)
    if fn is None:
        zeta_b = dev.base.scalar(dev.base.spec.zeta)
        ident = jnp.asarray(_ident_col_np(dev.base.spec.modulus))

        def impl(pp, bb, g, uj_m, ujinv_m, bits, negs):
            p_new = fadd(df, pp[:half],
                         fmul(df, pp[half:],
                              jnp.broadcast_to(ujinv_m, (half, NLIMBS))))
            b_new = fadd(df, bb[:half],
                         fmul(df, bb[half:],
                              jnp.broadcast_to(uj_m, (half, NLIMBS))))
            if not with_g:
                return p_new, b_new, jnp.zeros((0,), jnp.uint32)
            from ..fields.device import fneg
            glo = g[:, :half]
            ghi = g[:, half:2 * half]
            X, Y, Z = ghi[:16], ghi[16:32], ghi[32:48]
            negY = fneg(df=dev.base, a=Y.T).T

            def signed(neg_flag, x_part):
                y = jnp.where(neg_flag.astype(jnp.bool_), negY, Y)
                return jnp.concatenate([x_part, y, Z], axis=0)

            t1 = signed(negs[0], X)
            t2 = signed(negs[1],
                        fmul(dev.base, X.T,
                             jnp.broadcast_to(zeta_b, (half, NLIMBS))).T)
            t12 = padd_flat(dev.base, t1, t2, interpret=interpret)
            acc0 = jnp.broadcast_to(ident[:, None], (48, half))

            def body(i, acc):
                acc = pdouble_flat(dev.base, acc, interpret=interpret)
                b1 = bits[0, i]
                b2 = bits[1, i]
                sel = b1 + 2 * b2
                addend = jnp.where(sel == 3, t12,
                                   jnp.where(sel == 2, t2, t1))
                mask = jnp.broadcast_to(
                    (sel > 0).astype(jnp.uint32), (half,))
                return padd_masked_flat(dev.base, acc, addend, mask,
                                        interpret=interpret)

            acc = jax.lax.fori_loop(0, GLV_BITS, body, acc0)
            g_new = padd_flat(dev.base, glo, acc, interpret=interpret)
            return p_new, b_new, g_new
        fn = jax.jit(impl)
        _FOLD_JIT[key] = fn

    if with_g:
        s1, neg1, s2, neg2 = glv_split(fs, params.curve.name, u_j)
        bits = jnp.asarray(np.stack([_bits_msb(s1, GLV_BITS),
                                     _bits_msb(s2, GLV_BITS)]))
        negs = jnp.asarray(np.array([neg1, neg2], np.uint32))
    else:
        bits = jnp.zeros((2, GLV_BITS), jnp.uint32)
        negs = jnp.zeros((2,), jnp.uint32)
    g_in = gproj if with_g else jnp.zeros((48, 2 * half), jnp.uint32)
    p_new, b_new, g_new = fn(p_prime, b, g_in, df.scalar(u_j),
                             df.scalar(u_j_inv), bits, negs)
    return p_new, b_new, (g_new if with_g else None)
