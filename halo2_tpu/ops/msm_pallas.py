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


def pick_c(n: int) -> int:
    """Window size by explicit cost model of the round-loop schedule.

    The bucket-accumulation loop runs `max run length` rounds of one
    [48, (W+T−1)·B]-lane masked add. The top window only spans
    `255 − c·(W−1)` bits (scalars < 2^255), so its runs would be
    n/2^topbits; the T-way top-window split in
    msm_pallas_window_sums_many rebalances them to uniform length at the
    price of (T−1)·B extra lanes — the model charges both, plus the
    2·log2(B) suffix/tree rounds. Minimizing lands on c=8 at practical
    sizes (256 ≡ 0 mod c keeps the top window full-width, T=4 on the
    254.5-bit Pasta moduli)."""
    best_c, best_cost = 4, float("inf")
    signed = _use_signed()
    for c in range(4, 17):
        W = -(-256 // c)
        if signed:
            # signed windows: half the buckets, no top-split row
            BL = 1 << (c - 1)
            per_bucket = n / BL
            maxrun = per_bucket + 3.0 * math.sqrt(per_bucket) + 4.0
            cost = (maxrun + 2 * (c - 1)) * W * BL
        else:
            B = 1 << c
            topbits = max(255 - c * (W - 1), 1)
            T = max(1, B >> min(topbits, c))
            per_bucket = n / B
            maxrun = per_bucket + 3.0 * math.sqrt(per_bucket) + 4.0
            cost = (maxrun + 2 * c) * (W + T - 1) * B
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
    negation) AND kill the top-window skew: v_top ≤ 2^topbits ≤ 2^(c-1)
    never recodes, so no T-way split row is needed. Exact by the carry
    telescope: Σ ±a_w 2^{cw} = value (final carry provably 0 for
    values < 2^255 since c·W ≥ 256)."""
    d = window_digits(digits16, c)            # [W, n] unsigned
    W = d.shape[0]
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    absd, signs = [], []
    carry = jnp.zeros_like(d[0])
    for w in range(W):
        v = d[w] + carry
        neg = v > half
        absd.append(jnp.where(neg, full - v, v))
        signs.append(neg.astype(jnp.uint32))
        carry = neg.astype(jnp.uint32)
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
                           interpret: bool | None = None):
    """Device part of the MSM: returns ([48, W] window sums, c).

    pts: [48, n] projective batch; digits16: [n, 16] canonical scalars.
    """
    out, c = msm_pallas_window_sums_many(
        cv_spec, df, digits16[None], pts, c, interpret=interpret)
    return out[0], c


def msm_pallas_window_sums_many(cv_spec: CurveSpec, df: DeviceField,
                                digits16: jnp.ndarray, pts: jnp.ndarray,
                                c: int | None = None,
                                interpret: bool | None = None):
    """m MSMs over SHARED bases in one device program: returns
    ([m, 48, W] window sums, c).

    pts: [48, n] projective batch; digits16: [m, n, 16] canonical
    scalars. The m·W (scalar-set, window) problems are independent and
    simply widen the lane axis of every masked-add round — the round
    count stays ≈ n/B + slack, so committing a whole phase's columns
    costs barely more wall-clock than one column (this is how prover
    phases with many columns become a single dispatch)."""
    m, n = digits16.shape[0], digits16.shape[1]
    if c is None:
        c = pick_c(n)
    B = 1 << c
    W = -(-256 // c)
    G = m * W  # independent (scalar-set, window) rows

    # normalize bases once: mixed (Z2=1) adds in the round loop save ~3
    # wide muls per add; the segmented-scan fallback keeps the projective
    # form (its partial sums are not affine)
    pts_aff, pts = _normalize_affine(df, pts)

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
        lo = jnp.zeros((G, BL), dtype=jnp.int32)
        hi = jnp.full((G, BL), n, dtype=jnp.int32)
        for _ in range(n.bit_length()):
            mid = (lo + hi) >> 1
            v = jnp.take_along_axis(ds, jnp.minimum(mid, n - 1), axis=1)
            go_right = (v <= buckets) if leq else (v < buckets)
            go_right = go_right & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        return lo

    starts = _bisect(leq=False)
    ends = _bisect(leq=True)
    counts = (ends - starts).astype(jnp.int32)           # [G, BL]
    if signed:
        eff_counts = counts  # key 0 excluded by the bucket range itself
    else:
        # never loop for bucket-0 runs (digit 0 contributes nothing)
        eff_counts = counts.at[:, 0].set(0)

    # Top-window skew split (UNSIGNED path only — signed windows never
    # skew: v_top ≤ 2^(c-1)): scalars < q < 2^255 leave the top window
    # only `topbits` of entropy, so its bucket runs are ~B/2^topbits
    # times longer than the uniform windows' — without this the round
    # loop spends most of its iterations on a single window's tails
    # (measured 1113 rounds instead of ~310 at n=2^16, c=8 on Vesta).
    # Each top-window row is split into T sub-rows covering staggered
    # run slices; their partial window sums add back at the end
    # (summation-by-parts is linear in the bucket sums).
    top_range = ((cv_spec.scalar.modulus - 1) >> (c * (W - 1))) + 1
    T = 1 if signed else max(
        1, B // (1 << max(1, top_range.bit_length() - 1)))
    row_map = np.arange(G, dtype=np.int32)
    if T > 1:
        top_rows = np.arange(W - 1, G, W, dtype=np.int32)   # [m]
        extra = np.repeat(top_rows, T - 1)                  # [m*(T-1)]
        row_map = np.concatenate([row_map, extra])
        sub = np.zeros(row_map.shape[0], dtype=np.int32)
        sub[G:] = np.tile(np.arange(1, T, dtype=np.int32), m)
        is_top = np.zeros(row_map.shape[0], dtype=bool)
        is_top[top_rows] = True
        is_top[G:] = True
        rm = jnp.asarray(row_map)
        starts_e = starts[rm]
        counts_e = eff_counts[rm]
        order_e = order[rm]
        # slice length per (row, bucket): ceil(count / T) on top rows
        Lb = jnp.where(jnp.asarray(is_top)[:, None],
                       (counts_e + (T - 1)) // T, counts_e)
        off = jnp.asarray(sub)[:, None] * Lb
        starts_e = starts_e + off
        counts_e = jnp.clip(counts_e - off, 0, Lb)
    else:
        starts_e, counts_e, order_e = starts, eff_counts, order
    Ge = starts_e.shape[0]
    maxc = jnp.max(counts_e)

    ident_col = _ident_col_j(df.spec.modulus)
    acc0 = jnp.broadcast_to(ident_col[:, None], (3 * NLIMBS, Ge * BL))

    starts_i = starts_e.astype(jnp.int32)

    def _serial_runs(_):
        """One add per (row, bucket) run member per round; rounds = max
        run length. Optimal for near-uniform digit distributions
        (runs ≈ n/BL)."""
        def cond(state):
            r, _ = state
            return r < maxc

        def body(state):
            r, acc = state
            idx = jnp.minimum(starts_i + r, n - 1)       # [Ge, BL]
            valid = (r < counts_e).reshape(-1)           # [Ge*BL]
            gidx = jnp.take_along_axis(order_e, idx, axis=1)
            P = jnp.take(pts_aff, gidx.reshape(-1), axis=1)  # [32, Ge*BL]
            sig = (jnp.take_along_axis(sg, gidx, axis=1).reshape(-1)
                   if signed else None)
            acc = pmixed_masked_flat(df, acc, P,
                                     valid.astype(jnp.uint32),
                                     signs=sig, interpret=interpret)
            return r + 1, acc

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
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
        if Ge > G:
            # expand to the split-row layout: extra sub-rows contribute
            # identity (their work is already in the base rows here)
            pad = jnp.broadcast_to(ident_col[:, None],
                                   (3 * NLIMBS, (Ge - G) * BL))
            sums = jnp.concatenate([sums, pad], axis=1)
        return sums

    # Crossover: serial cost ≈ maxrun·(Ge·BL) lane-adds, scan cost ≈
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

    def suffix_round(i, suf):
        s = jnp.int32(1) << i
        suf3 = suf.reshape(3 * NLIMBS, Ge, BL)
        shifted = jnp.roll(suf3, -s, axis=2).reshape(3 * NLIMBS, -1)
        mask = jnp.broadcast_to((bidx + s < BL)[None, :], (Ge, BL))
        return padd_masked_flat(df, suf, shifted,
                                mask.reshape(-1).astype(jnp.uint32),
                                interpret=interpret)

    logb = int(math.ceil(math.log2(BL)))
    suf = jax.lax.fori_loop(0, logb, suffix_round, acc)

    if not signed:
        # drop bucket 0 (its suffix is the full per-window total, not
        # b·S_b)
        suf3 = suf.reshape(3 * NLIMBS, Ge, BL)
        ident_w = jnp.broadcast_to(ident_col[:, None, None],
                                   (3 * NLIMBS, Ge, 1))
        suf = jnp.concatenate([ident_w, suf3[:, :, 1:]], axis=2).reshape(
            3 * NLIMBS, -1)

    # tree sum over the bucket axis -> [48, Ge] (kept at full width with a
    # shrinking mask so one traced body serves every level)
    def tree_round(i, cur):
        half = jnp.int32(BL) >> (i + 1)
        cur3 = cur.reshape(3 * NLIMBS, Ge, BL)
        shifted = jnp.roll(cur3, -half, axis=2).reshape(3 * NLIMBS, -1)
        mask = jnp.broadcast_to((bidx < half)[None, :], (Ge, BL))
        return padd_masked_flat(df, cur, shifted,
                                mask.reshape(-1).astype(jnp.uint32),
                                interpret=interpret)

    cur = jax.lax.fori_loop(0, logb, tree_round, suf)
    wsums = cur.reshape(3 * NLIMBS, Ge, BL)[:, :, 0]     # [48, Ge]
    if T > 1:
        # fold the T-1 staggered partial sums back into each top window
        base = wsums[:, :G]
        ext = wsums[:, G:].reshape(3 * NLIMBS, m, T - 1)
        tr = jnp.asarray(top_rows)
        topsum = base[:, tr]                             # [48, m]
        for t in range(T - 1):
            topsum = padd_flat(df, topsum, ext[:, :, t],
                               interpret=interpret)
        wsums = base.at[:, tr].set(topsum)
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
def _window_sums_jit(cv_spec, df, digits16, pts, c, interpret):
    wsums, _ = msm_pallas_window_sums(cv_spec, df, digits16, pts, c,
                                      interpret=interpret)
    return wsums


def msm_pallas_window_sums_async(cv_spec: CurveSpec, df: DeviceField,
                                 digits16, pts, c: int | None = None,
                                 interpret: bool | None = None):
    """Jitted device part; returns (device [48, W] array, c) without
    blocking — callers can pipeline several MSMs before reading back."""
    n = digits16.shape[0]
    if c is None:
        c = pick_c(n)
    if interpret is None:
        from .pallas_point import _interpret_default
        interpret = _interpret_default()
    return _window_sums_jit(cv_spec, df, digits16, pts, c, interpret), c


def msm_pallas(cv_spec: CurveSpec, df: DeviceField, digits16, pts,
               c: int | None = None, interpret: bool | None = None):
    """Full MSM -> affine host point (device buckets + host combine)."""
    wsums, c = msm_pallas_window_sums_async(cv_spec, df, digits16, pts, c,
                                            interpret=interpret)
    window_pts = points_from_proj(cv_spec, df, wsums)
    return host_horner_combine(cv_spec, window_pts, c)
