"""Pippenger MSM on Pallas point kernels — the TPU hot path.

Replaces the reference's thread-parallel bucket MSM (`best_multiexp`,
halo2_proofs/src/arithmetic.rs:143-180) with a formulation built from
three fixed-shape Pallas kernels (ops/pallas_point.py) orchestrated by
XLA gathers — no scalar loops, no data-dependent shapes:

  1. window digit extraction  [W, n]           (u32 bit ops)
  2. argsort per window + bucket run starts    (XLA sort / searchsorted)
  3. bucket accumulation: `lax.while_loop` over rounds r — round r adds
     the r-th member of every (window, bucket) run at once via one
     [48, W·B] gather + one masked-add kernel call.  Exactly one point
     add per (point, window) of useful work; rounds = max run length
     (≈ n/B for uniform scalars, degenerate inputs stay correct, just
     slower).
  4. summation by parts (`Buckets::sum`, arithmetic.rs:74-93): Hillis-
     Steele suffix sums over the bucket axis (log2 B masked-add rounds),
     then a halving tree sum -> one point per window.
  5. window Horner combine: on host (W tiny serial group ops), or on
     device via a lax.scan of doubling kernels for jit-pure callers.

The group law is exact, so any schedule is bit-identical to the
reference's result (oracle: test_multiexp, arithmetic.rs:440-458).
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, batch_inv, fmul,
                             is_zero, int_to_limbs)
from ..curves.host import CurveSpec
from .pallas_point import (
    LANES, padd_flat, pdouble_flat, padd_masked_flat, pmixed_masked_flat,
    _ident_col_j, points_to_proj, points_from_proj,
)


def _normalize_affine(df: DeviceField, pts: jnp.ndarray):
    """[48, n] homogeneous projective batch -> ([32, n] affine batch with
    identity coded (0, mont 1), [48, n] projective with Z in {0, mont 1}).

    One batched inversion (~6 muls/point) buys mixed (Z2=1) adds in the
    bucket round loop (~3 fewer wide muls x W adds per point) for ANY
    input representation — SRS uploads arrive affine already, but folded
    IPA G' arrays and group-op outputs do not."""
    X = jnp.transpose(pts[:NLIMBS])               # [n, 16]
    Y = jnp.transpose(pts[NLIMBS:2 * NLIMBS])
    Z = jnp.transpose(pts[2 * NLIMBS:])
    zi = batch_inv(df, Z, axis=0)
    ax = fmul(df, X, zi)
    ay = fmul(df, Y, zi)
    ident = is_zero(df, Z)[:, None]
    one = jnp.asarray(int_to_limbs(df.r_mod_p))
    ax = jnp.where(ident, jnp.zeros_like(ax), ax)
    ay = jnp.where(ident, jnp.broadcast_to(one, ay.shape), ay)
    zn = jnp.where(ident, jnp.zeros_like(ay),
                   jnp.broadcast_to(one, ay.shape))
    aff = jnp.concatenate([jnp.transpose(ax), jnp.transpose(ay)], axis=0)
    proj = jnp.concatenate([aff, jnp.transpose(zn)], axis=0)
    return aff, proj


# Per-round fixed overhead in lane-equivalents: on the tunneled v5e a
# masked-add round costs ~(OVH + lanes) lane-units regardless of width
# (kernel launch + the gather op). Calibrated from the on-chip c-sweep
# at k=16 (scripts/msm_sweep_c.py); it pushes the optimum toward larger
# windows (fewer, wider rounds) than pure lane-add counting would.
_ROUND_OVERHEAD_LANES = 8192


def pick_c(n: int) -> int:
    """Window size by explicit cost model of the round-loop schedule.

    The bucket-accumulation loop runs `max run length` rounds
    (≈ n/BL after top-window slotting — see
    msm_pallas_window_sums_many) plus 2·log2(BL) suffix/tree reduction
    rounds, each one [48, W·BL]-lane masked add. Each round also pays a
    fixed launch/gather overhead (_ROUND_OVERHEAD_LANES), so the model
    is rounds × (overhead + lanes), which favors fewer/wider rounds
    than pure lane-add counting."""
    best_c, best_cost = 4, float("inf")
    signed = _use_signed()
    for c in range(4, 17):
        W = -(-256 // c)
        BL = 1 << (c - 1) if signed else 1 << c
        per_bucket = n / BL
        maxrun = per_bucket + 3.0 * math.sqrt(per_bucket) + 4.0
        rounds = maxrun + 2 * int(math.ceil(math.log2(BL)))
        cost = rounds * (W * BL + _ROUND_OVERHEAD_LANES)
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def window_digits(digits16: jnp.ndarray, c: int) -> jnp.ndarray:
    """Canonical 16-bit digit array [n, 16] -> [W, n] c-bit window digits
    (LSB window first)."""
    n = digits16.shape[0]
    W = -(-256 // c)
    ext = jnp.concatenate(
        [digits16.astype(jnp.uint32),
         jnp.zeros((n, 1), jnp.uint32)], axis=1)  # [n, 17]
    outs = []
    mask = jnp.uint32((1 << c) - 1)
    for w in range(W):
        bit = c * w
        li, off = bit // 16, bit % 16
        val = ext[:, li] >> off
        if off + c > 16:
            val = val | (ext[:, li + 1] << (16 - off))
        outs.append(val & mask)
    return jnp.stack(outs, axis=0)


def window_digits_signed(digits16: jnp.ndarray, c: int):
    """[n, 16] canonical digits -> signed c-bit windows: (abs [W, n] in
    [0, 2^(c-1)], sign [W, n] 0/1). Signed digits halve the bucket count
    (abs value indexes the bucket, the sign rides the free curve
    negation). The top window still skews (it spans only 255 − c·(W−1)
    bits of entropy, recoded or not) — handled by in-row slotting in
    msm_pallas_window_sums_many. Exact by the carry telescope:
    Σ ±a_w 2^{cw} = value (final carry provably 0 for values < 2^255
    since c·W ≥ 256).

    Carries are computed in CLOSED FORM rather than by the sequential
    per-window chain (which emitted W dependent ops — measured 26 ms at
    n=2^16): carry into window w is [(v mod 2^{cw}) > 2^{cw-1}], i.e.
    bit cw−1 of v AND (low cw−1 bits nonzero); a_w = d_w + carry_w −
    2^c·carry_{w+1} then satisfies |a_w| ≤ 2^{c-1} (ties at exactly
    half recode to −half + carry; either choice is a valid signed
    digit, the group total is identical)."""
    d = window_digits(digits16, c)            # [W, n] unsigned
    W = d.shape[0]
    full = jnp.uint32(1 << c)
    # prefix-nonzero over the 16 u16 limbs: pnz[li] = any limb < li != 0
    limb_nz = digits16 != 0                   # [n, 16]
    pnz = [jnp.zeros(digits16.shape[:1], jnp.bool_)]
    for li in range(1, 17):
        pnz.append(pnz[-1] | limb_nz[:, li - 1])

    def carry_into(w: int) -> jnp.ndarray:
        t = c * w                             # boundary bit index
        if t == 0:
            return jnp.zeros(digits16.shape[:1], jnp.uint32)
        if t - 1 >= 256:
            return jnp.zeros(digits16.shape[:1], jnp.uint32)
        li, b = (t - 1) // 16, (t - 1) % 16
        bit = (digits16[:, li] >> b) & 1
        low_nz = pnz[li] | ((digits16[:, li] & ((1 << b) - 1)) != 0)
        return bit & low_nz.astype(jnp.uint32)
    carries = [carry_into(w) for w in range(W + 1)]
    absd, signs = [], []
    for w in range(W):
        v = d[w] + carries[w]
        neg = carries[w + 1]
        absd.append(jnp.where(neg.astype(jnp.bool_), full - v, v))
        signs.append(neg)
    return jnp.stack(absd, axis=0), jnp.stack(signs, axis=0)


def _use_signed() -> bool:
    # read ONCE per process: the flag participates in traced-program
    # structure, and the jit caches key on shapes/statics only — a
    # mid-process flip would silently reuse stale traces
    global _SIGNED_MODE
    if _SIGNED_MODE is None:
        import os
        _SIGNED_MODE = os.environ.get(
            "HALO2_TPU_MSM_UNSIGNED", "") in ("", "0", "false")
    return _SIGNED_MODE


_SIGNED_MODE: bool | None = None


def msm_pallas_window_sums(cv_spec: CurveSpec, df: DeviceField,
                           digits16: jnp.ndarray, pts: jnp.ndarray,
                           c: int | None = None,
                           interpret: bool | None = None,
                           aff: jnp.ndarray | None = None):
    """Device part of the MSM: returns ([48, W] window sums, c).

    pts: [48, n] projective batch; digits16: [n, 16] canonical scalars.
    aff: see msm_pallas_window_sums_many.
    """
    out, c = msm_pallas_window_sums_many(
        cv_spec, df, digits16[None], pts, c, interpret=interpret, aff=aff)
    return out[0], c


def msm_pallas_window_sums_many(cv_spec: CurveSpec, df: DeviceField,
                                digits16: jnp.ndarray, pts: jnp.ndarray,
                                c: int | None = None,
                                interpret: bool | None = None,
                                aff: jnp.ndarray | None = None):
    """m MSMs over SHARED bases in one device program: returns
    ([m, 48, W] window sums, c).

    pts: [48, n] projective batch; digits16: [m, n, 16] canonical
    scalars. The m·W (scalar-set, window) problems are independent and
    simply widen the lane axis of every masked-add round — the round
    count stays ≈ n/B + slack, so committing a whole phase's columns
    costs barely more wall-clock than one column (this is how prover
    phases with many columns become a single dispatch).

    aff: optional [32, n] affine batch with identity coded (0, mont 1).
    When the CALLER knows the bases are affine (SRS uploads are — see
    DeviceCurve.points_to_device: Z ∈ {0, mont 1} with identity
    (0, mont 1, 0), so `proj[:32]` IS this coding for free), passing it
    switches the round loop to mixed (Z2=1) adds (~3 fewer wide muls per
    add). Without it the loop uses full projective adds — an in-graph
    batch inversion was measured strictly worse (the one-element Fermat
    tail serializes ~255 tiny kernels ≈ 70 ms per dispatch at k=16)."""
    m, n = digits16.shape[0], digits16.shape[1]
    if c is None:
        c = pick_c(n)
    B = 1 << c
    W = -(-256 // c)
    G = m * W  # independent (scalar-set, window) rows

    mixed = aff is not None
    pts_aff = aff

    signed = _use_signed()
    if signed:
        ds_list, sg_list = zip(*[window_digits_signed(digits16[j], c)
                                 for j in range(m)])
        d = jnp.concatenate(ds_list, axis=0)             # [G, n] abs keys
        sg = jnp.concatenate(sg_list, axis=0)            # [G, n] signs
        BL = 1 << (c - 1)     # lanes: bucket b∈[1, 2^(c-1)] at lane b-1
        bucket0 = 1
    else:
        d = jnp.concatenate([window_digits(digits16[j], c)
                             for j in range(m)], axis=0)  # [G, n]
        sg = None
        BL = B
        bucket0 = 0
    order = jnp.argsort(d, axis=1).astype(jnp.int32)     # [G, n]
    ds = jnp.take_along_axis(d, order, axis=1)           # sorted digits

    # Bucket run boundaries: a hand-vectorized binary search over the
    # sorted digit rows — ceil(log2 n)+1 rounds of one [G, BL] gather
    # each. (vmapped jnp.searchsorted lowered to a ~50 ms program at
    # n=2^16; XLA scatter-histograms were slower still.)
    buckets = (jnp.arange(BL, dtype=jnp.uint32)
               + jnp.uint32(bucket0))[None, :]           # [1, BL]

    def _bisect(leq: bool) -> jnp.ndarray:
        def body(_, state):
            lo, hi = state
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(ds, jnp.minimum(mid, n - 1), axis=1)
            go_right = (v <= buckets) if leq else (v < buckets)
            go_right = go_right & (mid < hi)
            return (jnp.where(go_right, mid + 1, lo),
                    jnp.where(go_right, hi, mid))

        lo, _ = jax.lax.fori_loop(
            0, n.bit_length(),
            body, (jnp.zeros((G, BL), dtype=jnp.int32),
                   jnp.full((G, BL), n, dtype=jnp.int32)))
        return lo

    starts = _bisect(leq=False)
    # ends come free: runs are contiguous in the sorted row, so the end
    # of bucket lane j is the start of lane j+1 (the last lane's end is
    # n — digits never exceed the top bucket). This halves the bisect.
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((G, 1), n, starts.dtype)], axis=1)
    counts = (ends - starts).astype(jnp.int32)           # [G, BL]
    if signed:
        eff_counts = counts  # key 0 excluded by the bucket range itself
    else:
        # never loop for bucket-0 runs (digit 0 contributes nothing)
        eff_counts = counts.at[:, 0].set(0)

    # Top-window skew — in-row slotting: scalars < q < 2^255 leave the
    # top window only `topbits` of entropy, so its bucket runs are
    # ~BL/2^topbits times longer than the uniform windows' and only the
    # first ~2^topbits bucket lanes are live — without treatment the
    # round loop spends most of its iterations on one window's tails
    # (or tips into the segmented-scan branch: measured 415 ms vs
    # ~60 ms at k=16). Instead of T extra split ROWS (the round-4
    # scheme — it multiplied lanes by T with mostly-dead buckets:
    # 92 rows / 23K lanes at k=16 c=9 signed), repurpose the DEAD lanes
    # of the top row itself: lane u serves bucket u//S (+bucket0),
    # slice u%S of that bucket's run, S = BL/L_pow staggered slices.
    # Every lane is live, run lengths return to ~n/BL, and the row/lane
    # geometry is unchanged. The serial branch un-slots afterwards
    # (slice tree-add + one lane gather) before the generic
    # summation-by-parts; the scan branch never slots.
    maxv = int((cv_spec.scalar.modulus - 1) >> (c * (W - 1))) + 1
    # +1 below: a signed-recode carry can push the top digit one past
    # maxv; L_pow must cover bucket lane (maxv + 1) - bucket0
    L_pow = 1 << max(1, (maxv + 1 - bucket0).bit_length())
    S = max(1, BL // L_pow)
    top_rows = np.arange(W - 1, G, W, dtype=np.int32)    # [m]
    is_top = np.zeros(G, dtype=bool)
    is_top[top_rows] = True
    if S > 1:
        lane = np.arange(BL)
        sb = jnp.asarray(lane // S, dtype=jnp.int32)   # source bucket lane
        ss = jnp.asarray(lane % S, dtype=jnp.int32)    # slice index
        g_starts = jnp.take(starts, sb, axis=1)
        g_counts = jnp.take(eff_counts, sb, axis=1)
        Ls = (g_counts + (S - 1)) // S                 # slice length
        itop = jnp.asarray(is_top)[:, None]
        starts_e = jnp.where(itop, g_starts + ss[None, :] * Ls, starts)
        counts_e = jnp.where(itop,
                             jnp.clip(g_counts - ss[None, :] * Ls, 0, Ls),
                             eff_counts)
    else:
        starts_e, counts_e = starts, eff_counts
    order_e, sg_e = order, sg
    maxc = jnp.max(counts_e)

    ident_col = _ident_col_j(df.spec.modulus)
    acc0 = jnp.broadcast_to(ident_col[:, None], (3 * NLIMBS, G * BL))

    starts_i = starts_e.astype(jnp.int32)

    def _add_round(acc, gi, valid, sig):
        """One masked bucket-add round: gather the points at flat base
        indices `gi` and fold them into the [48, G·BL] accumulator."""
        if mixed:
            P = jnp.take(pts_aff, gi, axis=1)
            return pmixed_masked_flat(df, acc, P,
                                      valid.astype(jnp.uint32),
                                      signs=sig, interpret=interpret)
        P = jnp.take(pts, gi, axis=1)                    # [48, lanes]
        if signed:
            # −P = (X, −Y, Z): one elementwise negate on the gathered
            # copy (each point carries a different sign per window, so
            # pre-negating the base array can't work)
            from ..fields.device import fneg
            Yt = jnp.transpose(P[NLIMBS:2 * NLIMBS])
            Yt = jnp.where(sig.astype(jnp.bool_)[:, None],
                           fneg(df, Yt), Yt)
            P = jnp.concatenate(
                [P[:NLIMBS], jnp.transpose(Yt), P[2 * NLIMBS:]],
                axis=0)
        return padd_masked_flat(df, acc, P, valid.astype(jnp.uint32),
                                interpret=interpret)

    def _serial_runs(_):
        """One add per (row, bucket) run member per round; rounds = max
        run length (≈ n/BL for near-uniform digits after slotting).

        The first R_static rounds read PRECOMPUTED gather indices /
        signs / valid bits — three big gathers up front instead of
        three small dependent [G, BL] gathers per round (whose per-op
        launch overhead dominated the loop: measured 83 ms vs 35 ms at
        k=16 c=11). A while_loop tail with in-loop gathers covers the
        rare runs longer than R_static (moderately skewed inputs below
        the segmented-scan threshold), so results stay exact for every
        input."""
        mean_run = max(1, n // BL)
        R_static = int(min(n, mean_run + 4 * math.isqrt(mean_run) + 16))
        rr = jnp.arange(R_static, dtype=jnp.int32)
        idx_all = jnp.minimum(starts_i[None] + rr[:, None, None], n - 1)
        g_off = (jnp.arange(G, dtype=jnp.int32) * n)[None, :, None]
        gidx_all = jnp.take(order_e.reshape(-1),
                            (idx_all + g_off).reshape(-1)
                            ).reshape(R_static, G * BL)
        valid_all = (rr[:, None, None] < counts_e[None]).reshape(
            R_static, G * BL)
        sig_all = (jnp.take(sg_e.reshape(-1),
                            (gidx_all.reshape(R_static, G, BL) + g_off
                             ).reshape(-1)).reshape(R_static, G * BL)
                   if signed else None)

        def bodyA(r, acc):
            return _add_round(acc, gidx_all[r], valid_all[r],
                              sig_all[r] if signed else None)

        acc = jax.lax.fori_loop(0, jnp.minimum(maxc, R_static), bodyA,
                                acc0)

        def condB(state):
            r, _ = state
            return r < maxc

        def bodyB(state):
            r, acc = state
            idx = jnp.minimum(starts_i + r, n - 1)       # [G, BL]
            valid = (r < counts_e).reshape(-1)           # [G*BL]
            gidx = jnp.take_along_axis(order_e, idx, axis=1)
            sig = (jnp.take_along_axis(sg_e, gidx, axis=1).reshape(-1)
                   if signed else None)
            return r + 1, _add_round(acc, gidx.reshape(-1), valid, sig)

        _, acc = jax.lax.while_loop(condB, bodyB,
                                    (jnp.int32(R_static), acc))

        if S > 1:
            # un-slot the top rows: tree-add the S slices of each bucket
            # into slice 0 (log2 S masked rounds, one fori body — see
            # the executable-size note at the summation-by-parts loops),
            # then move bucket j's total from lane j*S to lane j and
            # fill lanes >= L_pow with identity so the generic
            # summation-by-parts sees the plain bucket-ordered layout
            lane_mod = jnp.asarray((np.arange(BL) % S).astype(np.int32))
            trow = jnp.asarray(is_top)[:, None]

            def unslot_round(i, acc):
                h = jnp.int32(S) >> (i + 1)
                acc3 = acc.reshape(3 * NLIMBS, G, BL)
                shifted = jnp.roll(acc3, -h, axis=2).reshape(
                    3 * NLIMBS, -1)
                mask = trow & (lane_mod < h)[None, :]
                return padd_masked_flat(
                    df, acc, shifted,
                    mask.reshape(-1).astype(jnp.uint32),
                    interpret=interpret)

            acc = jax.lax.fori_loop(0, int(math.log2(S)), unslot_round,
                                    acc)
            perm = np.arange(BL, dtype=np.int32)
            perm[:L_pow] = np.arange(L_pow, dtype=np.int32) * S
            gidx2 = np.tile(np.arange(BL, dtype=np.int32), (G, 1))
            gidx2[is_top] = perm
            gflat = (np.arange(G, dtype=np.int32)[:, None] * BL
                     + gidx2).reshape(-1)
            acc = jnp.take(acc, jnp.asarray(gflat), axis=1)
            kill = np.zeros((G, BL), dtype=bool)
            kill[is_top] = np.arange(BL)[None, :] >= L_pow
            idw = jnp.broadcast_to(ident_col[:, None], acc.shape)
            acc = jnp.where(jnp.asarray(kill.reshape(-1))[None, :],
                            idw, acc)
        return acc

    def _segmented_scan(_):
        """Log-depth fallback for SKEWED digit distributions (few
        distinct scalar values — selector/fixed columns, structured
        witnesses): a Hillis-Steele segmented scan over the sorted
        point array reduces every run in ceil(log2 maxrun) rounds of
        one [48, G·n] masked add, where the serial loop would need
        `maxrun` rounds (up to n for an all-equal column)."""
        psort = jnp.take(pts, order.reshape(-1), axis=1)  # [48, G*n]
        if signed:
            # apply the digit signs to the sorted copies up front (the
            # scan's partial sums then carry them implicitly)
            from ..fields.device import fneg
            sgsort = jnp.take_along_axis(sg, order, axis=1).reshape(-1)
            Yt = jnp.transpose(psort[NLIMBS:2 * NLIMBS])
            Yt = jnp.where(sgsort.astype(jnp.bool_)[:, None],
                           fneg(df, Yt), Yt)
            psort = jnp.concatenate(
                [psort[:NLIMBS], jnp.transpose(Yt), psort[2 * NLIMBS:]],
                axis=0)
        pos = jnp.arange(n, dtype=jnp.int32)[None, :]     # [1, n]
        maxc_full = jnp.max(eff_counts)  # UNSPLIT max run length

        def scond(state):
            d, _ = state
            return d < maxc_full

        def sbody(state):
            d, cur = state
            cur3 = cur.reshape(3 * NLIMBS, G, n)
            shifted = jnp.roll(cur3, d, axis=2).reshape(3 * NLIMBS, -1)
            same = jnp.roll(ds, d, axis=1) == ds          # [G, n]
            mask = same & (pos >= d)
            cur = padd_masked_flat(df, cur, shifted,
                                   mask.reshape(-1).astype(jnp.uint32),
                                   interpret=interpret)
            return d * 2, cur

        _, scanned = jax.lax.while_loop(scond, sbody,
                                        (jnp.int32(1), psort))
        # run-end positions hold full run sums -> [48, G*BL]
        endpos = jnp.maximum(ends - 1, 0)                 # [G, BL]
        flat = (jnp.arange(G, dtype=jnp.int32)[:, None] * n
                + endpos).reshape(-1)
        sums = jnp.take(scanned, flat, axis=1)            # [48, G*BL]
        nonempty = (eff_counts > 0).reshape(-1)
        idw = jnp.broadcast_to(ident_col[:, None], sums.shape)
        sums = jnp.where(nonempty[None, :], sums, idw)
        return sums

    # Crossover: serial cost ≈ maxrun·(G·BL) lane-adds, scan cost ≈
    # ceil(log2 maxrun)·(G·n). Pick per input at runtime — one compiled
    # graph, lax.cond executes a single branch on TPU.
    skew_threshold = jnp.int32(max(2 * c * ((n // BL) + 1) + 2 * c, 64))
    acc = jax.lax.cond(maxc > skew_threshold, _segmented_scan,
                       _serial_runs, operand=None)

    # summation by parts: suffix sums along the bucket axis, then the
    # per-window total of the suffix series equals sum_b b * S_b.
    # Both phases are fori_loops over ceil(log2(BL)) rounds of one
    # fixed-shape masked-add each (rolled lanes beyond the window edge
    # are masked off) to keep the traced graph small. Lane j holds
    # bucket j+bucket0, so Σ_j suf[j] = Σ_b (b − bucket0 + 1)·S_b; for
    # the signed layout (bucket0=1, no lane 0 waste) that IS Σ b·S_b,
    # for the unsigned layout the bucket-0 lane is dropped below.
    bidx = jnp.arange(BL, dtype=jnp.int32)
    logb = int(math.ceil(math.log2(BL)))

    # Both phases are fori_loops over one fixed-shape masked-add body —
    # shifts and masks are computed IN-GRAPH from the loop index rather
    # than unrolled into per-level kernel instances: every extra Pallas
    # instance adds ~1 MB of executable, and on the tunneled runtime
    # executable bytes ARE the fresh-process cost (~1.4 MB/s first-call
    # transfer, measured).
    def suffix_round(i, suf):
        s = jnp.int32(1) << i
        suf3 = suf.reshape(3 * NLIMBS, G, BL)
        shifted = jnp.roll(suf3, -s, axis=2).reshape(3 * NLIMBS, -1)
        mask = jnp.broadcast_to((bidx + s < BL)[None, :], (G, BL))
        return padd_masked_flat(df, suf, shifted,
                                mask.reshape(-1).astype(jnp.uint32),
                                interpret=interpret)

    suf = jax.lax.fori_loop(0, logb, suffix_round, acc)

    if not signed:
        # drop bucket 0 (its suffix is the full per-window total, not
        # b·S_b)
        suf3 = suf.reshape(3 * NLIMBS, G, BL)
        ident_w = jnp.broadcast_to(ident_col[:, None, None],
                                   (3 * NLIMBS, G, 1))
        suf = jnp.concatenate([ident_w, suf3[:, :, 1:]], axis=2).reshape(
            3 * NLIMBS, -1)

    # tree sum over the bucket axis -> [48, G] (full width with a
    # shrinking in-graph mask: one traced body serves every level)
    def tree_round(i, cur):
        half = jnp.int32(BL) >> (i + 1)
        cur3 = cur.reshape(3 * NLIMBS, G, BL)
        shifted = jnp.roll(cur3, -half, axis=2).reshape(3 * NLIMBS, -1)
        mask = jnp.broadcast_to((bidx < half)[None, :], (G, BL))
        return padd_masked_flat(df, cur, shifted,
                                mask.reshape(-1).astype(jnp.uint32),
                                interpret=interpret)

    cur = jax.lax.fori_loop(0, logb, tree_round, suf)
    wsums = cur.reshape(3 * NLIMBS, G, BL)[:, :, 0]      # [48, G]
    return jnp.moveaxis(wsums.reshape(3 * NLIMBS, m, W), 1, 0), c


def _host_proj_add(p, a, b):
    """RCB complete add on host int 3-tuples (X, Y, Z); a=0, b3 = 15."""
    X1, Y1, Z1 = a
    X2, Y2, Z2 = b
    t0 = X1 * X2 % p
    t1 = Y1 * Y2 % p
    t2 = Z1 * Z2 % p
    t3 = ((X1 + Y1) * (X2 + Y2) - t0 - t1) % p   # X1Y2 + X2Y1
    t4 = ((Y1 + Z1) * (Y2 + Z2) - t1 - t2) % p   # Y1Z2 + Y2Z1
    xz = ((X1 + Z1) * (X2 + Z2) - t0 - t2) % p   # X1Z2 + X2Z1
    s0 = 3 * t0 % p                               # 3 X1X2
    b3z = 15 * t2 % p
    z3 = (t1 + b3z) % p
    s1 = (t1 - b3z) % p
    y3 = 15 * xz % p
    X3 = (t3 * s1 - t4 * y3) % p
    Y3 = (y3 * s0 + s1 * z3) % p
    Z3 = (z3 * t4 + s0 * t3) % p
    return (X3, Y3, Z3)


def _host_proj_double(p, a):
    X, Y, Z = a
    t0 = Y * Y % p
    z3 = 8 * t0 % p
    t1 = Y * Z % p
    t2 = 15 * (Z * Z % p) % p
    X3 = t2 * z3 % p
    Y3 = t0 + t2
    Z3 = t1 * z3 % p
    t1 = 2 * t2
    t2 = (t1 + t2) % p
    t0 = (t0 - t2) % p
    Y3 = (t0 * Y3 + X3) % p
    t1 = X * Y % p
    X3 = 2 * t0 * t1 % p
    return (X3, Y3, Z3)


def host_horner_combine(spec: CurveSpec, window_pts: list, c: int):
    """Host Horner over MSB-first window sums: tiny serial group work.
    window_pts: list of affine host points (LSB window first)."""
    p = spec.base.modulus
    acc = (0, 1, 0)
    for pt in reversed(window_pts):
        for _ in range(c):
            acc = _host_proj_double(p, acc)
        if pt is not None:
            acc = _host_proj_add(p, acc, (pt[0], pt[1], 1))
    X, Y, Z = acc
    if Z == 0:
        return None
    zi = pow(Z, -1, p)
    return (X * zi % p, Y * zi % p)


def device_horner_combine(df: DeviceField, wsums: jnp.ndarray, c: int,
                          interpret: bool | None = None) -> jnp.ndarray:
    """jit-pure window combine: lax.scan over windows MSB->LSB, each
    step c doubling kernels + one add (width-1 batches — used by the
    sharded pipeline / dryrun; host combine is faster interactively)."""
    W = wsums.shape[1]
    ident = _ident_col_j(df.spec.modulus)[:, None]

    def step(acc, wcol):
        for _ in range(c):
            acc = pdouble_flat(df, acc, interpret=interpret)
        acc = padd_flat(df, acc, wcol[:, None], interpret=interpret)
        return acc, None

    acc, _ = jax.lax.scan(step, jnp.broadcast_to(ident, ident.shape),
                          jnp.flip(wsums, axis=1).T)
    return acc[:, 0]


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _window_sums_jit(cv_spec, df, digits16, pts, c, interpret, aff=None):
    wsums, _ = msm_pallas_window_sums(cv_spec, df, digits16, pts, c,
                                      interpret=interpret, aff=aff)
    return wsums


def msm_pallas_window_sums_async(cv_spec: CurveSpec, df: DeviceField,
                                 digits16, pts, c: int | None = None,
                                 interpret: bool | None = None,
                                 aff: jnp.ndarray | None = None):
    """Jitted device part; returns (device [48, W] array, c) without
    blocking — callers can pipeline several MSMs before reading back."""
    n = digits16.shape[0]
    if c is None:
        c = pick_c(n)
    if interpret is None:
        from .pallas_point import _interpret_default
        interpret = _interpret_default()
    return _window_sums_jit(cv_spec, df, digits16, pts, c, interpret,
                            aff=aff), c


def msm_pallas(cv_spec: CurveSpec, df: DeviceField, digits16, pts,
               c: int | None = None, interpret: bool | None = None,
               aff: jnp.ndarray | None = None):
    """Full MSM -> affine host point (device buckets + host combine)."""
    wsums, c = msm_pallas_window_sums_async(cv_spec, df, digits16, pts, c,
                                            interpret=interpret, aff=aff)
    window_pts = points_from_proj(cv_spec, df, wsums)
    return host_horner_combine(cv_spec, window_pts, c)
