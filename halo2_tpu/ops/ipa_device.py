"""Device IPA tail: Pallas-kernel L/R MSMs + GLV-folded G' collapse.

Reference: halo2_proofs/src/poly/commitment/prover.rs:100-166 — per
round, two cross-term MSMs (L_j/R_j), two inner products, then the
collapse p' = p'_lo + u_j^-1 p'_hi, b = b_lo + u_j b_hi, and
G' = G'_lo + [u_j] G'_hi (`parallel_generator_collapse`).

TPU formulation (ONE fused dispatch per round, ≤4 executables per k):
  - each round dispatches a bucketed fold+next-L/R program (see the
    "bucketed fold+LR rounds" section): fold p'/b at runtime width h,
    collapse G' with a GLV-split ladder — u_j = ±s1 ± s2*λ with
    |s1|,|s2| < 2^130 (GLV_BITS iterations — half the 255-bit
    double-and-add ladder) and [λ]P = φ(P) = (ζ_p·x, y) (the curve
    endomorphism the native library also exploits,
    native/pasta.cc:698-777) — then compute the NEXT round's Pippenger
    L/R window sums + inner products over the folded state, all inside
    one jit. The host Horner-combines the window sums (tiny serial
    group math) and writes the transcript.

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
# bucketed fold+LR rounds — the executable-count-frugal formulation
# ---------------------------------------------------------------------------
#
# The round-per-shape design needed ~2 executables per round (34 loads at
# k=16 on a runtime where a fresh-process executable LOAD costs 10-30 s).
# This formulation keeps the open state at FULL width n for every round
# (p'/b zero-padded, G' identity-padded) and compiles ONE program per
# power-of-4 "bucket" width Wf ∈ {n/2, n/8, n/32, … ≥ TAIL}:
#
#   fold_lr(state, u_j, h) = fold p'/b/G' at runtime width h ≤ Wf,
#                            then the NEXT round's L/R window sums +
#                            inner products at h/2,
#
# so every round after the first is one dispatch of one of ~3 programs
# (h is a runtime scalar; lanes ≥ h are masked — zero scalars fall in
# the excluded 0-bucket of the Pippenger sort, identity bases pass
# through). The first round has a fold-free variant per top bucket.
# Total: ≤ 4 executables per k instead of ~2k.

def _tail_wf() -> int:
    import os
    return int(os.environ.get("HALO2_TPU_IPA_TAIL_WF", "2048"))


_FOLDLR_JIT: dict = {}


def bucket_widths(n: int) -> list[int]:
    """Descending power-of-4 ladder of bucket widths for a size-n open."""
    tail = _tail_wf()
    ws = []
    w = n // 2
    while w > tail:
        ws.append(w)
        w //= 4
    ws.append(max(w, 1))
    return ws


def bucket_for(half: int, n: int) -> int:
    wf = None
    for w in bucket_widths(n):
        if half <= w:
            wf = w
    if wf is None:
        raise ValueError(f"half={half} exceeds every bucket width of "
                         f"a size-{n} open (max {n // 2})")
    return wf


def _ipa_fold_lr_fn(params, n: int, wf: int, first: bool,
                    interpret: bool, with_lr: bool = True):
    """Build the bucket-Wf program. first=True skips the fold (round 0);
    with_lr=False builds a fold-only variant (the hybrid path's LAST
    device round — its next-round L/R would be discarded at the native
    handoff, roughly a full round of MSM work)."""
    df = params.scalar_df
    dev = params.dev
    dfb = dev.base
    c = mp.pick_c(wf)
    ident = jnp.asarray(_ident_col_np(dfb.spec.modulus))
    zeta_b = dfb.scalar(dfb.spec.zeta)

    def impl(pp, bb, g, ujm, ujinvm, bits, negs, h):
        S = min(2 * wf, n)
        idxw = jnp.arange(wf, dtype=jnp.int32)
        if first:
            # no fold yet: L/R over the FULL unfolded state (width n —
            # p'_hi lives at [wf, 2wf), beyond any width-wf slice)
            idxw = jnp.arange(n, dtype=jnp.int32)
            p_f, b_f, g_f = pp, bb, g
            wf_lr = n
            h2 = h  # round-0 L/R run at the full top half
        else:
            wf_lr = wf
            pp_s, bb_s, g_s = pp[:S], bb[:S], g[:, :S]
            hi_idx = jnp.clip(idxw + h, 0, S - 1)
            hi_ok = (idxw + h) < S
            lane_ok = idxw < h
            pp_hi = jnp.where(hi_ok[:, None],
                              jnp.take(pp_s, hi_idx, axis=0), 0)
            bb_hi = jnp.where(hi_ok[:, None],
                              jnp.take(bb_s, hi_idx, axis=0), 0)
            p_f = fadd(df, pp_s[:wf],
                       fmul(df, pp_hi,
                            jnp.broadcast_to(ujinvm, (wf, NLIMBS))))
            b_f = fadd(df, bb_s[:wf],
                       fmul(df, bb_hi,
                            jnp.broadcast_to(ujm, (wf, NLIMBS))))
            p_f = jnp.where(lane_ok[:, None], p_f, 0)
            b_f = jnp.where(lane_ok[:, None], b_f, 0)

            # G' collapse via the GLV ladder: [u_j] G'_hi, then + G'_lo
            from ..fields.device import fneg
            ghi = jnp.where(hi_ok[None, :],
                            jnp.take(g_s, hi_idx, axis=1), 0)
            X, Y, Z = ghi[:16], ghi[16:32], ghi[32:48]
            negY = fneg(dfb, Y.T).T

            def signed(neg_flag, x_part):
                y = jnp.where(neg_flag.astype(jnp.bool_), negY, Y)
                return jnp.concatenate([x_part, y, Z], axis=0)

            t1 = signed(negs[0], X)
            t2 = signed(negs[1],
                        fmul(dfb, X.T,
                             jnp.broadcast_to(zeta_b, (wf, NLIMBS))).T)
            t12 = padd_flat(dfb, t1, t2, interpret=interpret)
            acc0 = jnp.broadcast_to(ident[:, None], (48, wf))

            def body(i, acc):
                acc = pdouble_flat(dfb, acc, interpret=interpret)
                b1 = bits[0, i]
                b2 = bits[1, i]
                sel = b1 + 2 * b2
                addend = jnp.where(sel == 3, t12,
                                   jnp.where(sel == 2, t2, t1))
                mask = ((sel > 0) & lane_ok).astype(jnp.uint32)
                return padd_masked_flat(dfb, acc, addend, mask,
                                        interpret=interpret)

            acc = jax.lax.fori_loop(0, GLV_BITS, body, acc0)
            g_f = padd_flat(dfb, g_s[:, :wf], acc, interpret=interpret)
            g_f = jnp.where(lane_ok[None, :], g_f,
                            jnp.broadcast_to(ident[:, None], (48, wf)))
            h2 = h >> 1

        if not with_lr:
            zp = jnp.zeros((n - wf, NLIMBS), jnp.uint32)
            gp = jnp.broadcast_to(ident[:, None], (48, n - wf))
            return (jnp.concatenate([p_f, zp], axis=0),
                    jnp.concatenate([b_f, zp], axis=0),
                    jnp.concatenate([g_f, gp], axis=1))

        # ---- next round's L/R over the folded width-h2 state ----
        d_all = from_mont(df, p_f)                      # [wf_lr, 16]
        hi2 = jnp.clip(idxw + h2, 0, wf_lr - 1)
        ok2 = (idxw + h2) < wf_lr
        in2 = idxw < h2
        dL = jnp.where((ok2 & in2)[:, None],
                       jnp.take(d_all, hi2, axis=0), 0)
        dR = jnp.where(in2[:, None], d_all, 0)
        basesR = jnp.where(ok2[None, :], jnp.take(g_f, hi2, axis=1), 0)
        wl, _ = mp.msm_pallas_window_sums(params.curve, dfb, dL, g_f, c,
                                          interpret=interpret)
        wr, _ = mp.msm_pallas_window_sums(params.curve, dfb, dR, basesR,
                                          c, interpret=interpret)
        b_hi2 = jnp.where(ok2[:, None], jnp.take(b_f, hi2, axis=0), 0)
        p_hi2 = jnp.where(ok2[:, None], jnp.take(p_f, hi2, axis=0), 0)
        vl = inner_product(df, p_hi2, b_f)
        vr = inner_product(df, p_f, b_hi2)

        if first:
            return wl, wr, jnp.stack([vl, vr])
        # pad the folded state back to uniform width n
        zp = jnp.zeros((n - wf, NLIMBS), jnp.uint32)
        gp = jnp.broadcast_to(ident[:, None], (48, n - wf))
        return (jnp.concatenate([p_f, zp], axis=0),
                jnp.concatenate([b_f, zp], axis=0),
                jnp.concatenate([g_f, gp], axis=1),
                wl, wr, jnp.stack([vl, vr]))

    return jax.jit(impl), c


def ipa_device_first_lr(params, p_prime, b, gproj):
    """Round-0 L/R (no fold yet): one dispatch of the top-bucket
    first-variant. Returns (l_pt, r_pt, value_l, value_r) on host."""
    n = p_prime.shape[0]
    wf = n // 2
    interpret = _interpret_default()
    key = (params.curve.name, n, wf, "first", interpret)
    ent = _FOLDLR_JIT.get(key)
    if ent is None:
        ent = _ipa_fold_lr_fn(params, n, wf, True, interpret)
        _FOLDLR_JIT[key] = ent
    fn, c = ent
    zero_bits = jnp.zeros((2, GLV_BITS), jnp.uint32)
    zero_negs = jnp.zeros((2,), jnp.uint32)
    one = params.scalar_df.scalar(1)
    wl, wr, vals = fn(p_prime, b, gproj, one, one, zero_bits, zero_negs,
                      jnp.int32(wf))
    return _lr_to_host(params, wl, wr, vals, c)


def ipa_device_fold_lr(params, p_prime, b, gproj, half: int, u_j: int,
                       u_j_inv: int, with_lr: bool = True):
    """Fold round at width `half` (+ the NEXT round's L/R unless
    with_lr=False), one dispatch. Returns (p', b', g', l_pt, r_pt,
    value_l, value_r) — the L/R slots are None for with_lr=False and
    garbage on the final call (half == 1); callers ignore them."""
    df = params.scalar_df
    fs = params.curve.scalar
    n = p_prime.shape[0]
    wf = bucket_for(half, n)
    interpret = _interpret_default()
    key = (params.curve.name, n, wf, "fold", with_lr, interpret)
    ent = _FOLDLR_JIT.get(key)
    if ent is None:
        ent = _ipa_fold_lr_fn(params, n, wf, False, interpret,
                              with_lr=with_lr)
        _FOLDLR_JIT[key] = ent
    fn, c = ent
    s1, neg1, s2, neg2 = glv_split(fs, params.curve.name, u_j)
    bits = jnp.asarray(np.stack([_bits_msb(s1, GLV_BITS),
                                 _bits_msb(s2, GLV_BITS)]))
    negs = jnp.asarray(np.array([neg1, neg2], np.uint32))
    args = (p_prime, b, gproj, df.scalar(u_j), df.scalar(u_j_inv), bits,
            negs, jnp.int32(half))
    if not with_lr:
        p_n, b_n, g_n = fn(*args)
        return p_n, b_n, g_n, None, None, None, None
    p_n, b_n, g_n, wl, wr, vals = fn(*args)
    l_pt, r_pt, vl, vr = _lr_to_host(params, wl, wr, vals, c)
    return p_n, b_n, g_n, l_pt, r_pt, vl, vr


def _lr_to_host(params, wl, wr, vals, c):
    df = params.scalar_df
    dev = params.dev
    wl_np, wr_np, vals_np = (np.asarray(wl), np.asarray(wr),
                             np.asarray(vals))
    l_pt = mp.host_horner_combine(
        params.curve, mp.points_from_proj(params.curve, dev.base, wl_np), c)
    r_pt = mp.host_horner_combine(
        params.curve, mp.points_from_proj(params.curve, dev.base, wr_np), c)
    value_l, value_r = (int(v) for v in df.from_mont_np(vals_np))
    return l_pt, r_pt, value_l, value_r
