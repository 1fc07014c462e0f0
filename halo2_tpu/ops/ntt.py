"""Radix-2 NTT over device field arrays (and over curve-point batches).

TPU-native replacement for the reference's `best_fft`
(halo2_proofs/src/arithmetic.rs:192-295): the fork-join recursive butterfly
becomes log2(n) fully-vectorized butterfly stages over a [n, 16] limb array;
the bit-reversal permutation is a single gather. The generic `FftGroup`
polymorphism (field *and* curve-group FFTs, arithmetic.rs:17-27) maps to
`ntt` / `group_ntt`: the latter runs the same stages with per-lane scalar
multiplication (needed once per SRS for `g_lagrange`,
poly/commitment.rs:75-100).

Multi-device sharding: see halo2_tpu/parallel — local stages + all_to_all
transpose between phases.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, fadd, fsub, fmul,
                             int_to_limbs)
from ..curves.device import (DeviceCurve, JPoint, padd, batch_scalar_mul,
                             pselect)


def bit_reverse_perm(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@dataclass(frozen=True, eq=False)
class NttPlan:
    """Precomputed tables for a size-n NTT with root `omega` (host ints).
    `twiddles[s]` holds the 2^s twiddle factors of stage s in Montgomery
    form; `perm` is the bit-reversal gather."""
    n: int
    omega: int
    perm: np.ndarray
    twiddles: tuple          # tuple of np.uint32 [2^s, 16] mont arrays
    twiddle_exps: tuple      # tuple of python-int tuples (for group NTT)


def make_plan(df: DeviceField, n: int, omega: int) -> NttPlan:
    p = df.spec.modulus
    assert n & (n - 1) == 0
    k = n.bit_length() - 1
    assert pow(omega, n, p) == 1
    twiddles = []
    exps = []
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        w_m = pow(omega, n // m, p)
        ws = []
        w = 1
        for _ in range(half):
            ws.append(w)
            w = w * w_m % p
        exps.append(tuple(ws))
        twiddles.append(np.asarray(df.to_mont_np(ws)).reshape(half, NLIMBS))
    return NttPlan(n=n, omega=omega, perm=bit_reverse_perm(n),
                   twiddles=tuple(twiddles), twiddle_exps=tuple(exps))


_NTT_JIT: dict = {}       # (id(df), n) -> jitted stage program
_PLAN_DEV: dict = {}      # id(plan) -> (plan, perm_dev, tuple(tw_dev))


def _plan_dev(plan: NttPlan):
    """Device-resident copies of a plan's perm + twiddles, uploaded once
    (the eager path re-uploaded every stage of every call).

    Never caches under an active trace: inside shard_map/jit tracing,
    jnp.asarray of a host constant yields a TRACER, and caching it
    leaks it into later traces (UnexpectedTracerError after a
    jax.clear_caches() forces a re-trace)."""
    import jax.core
    ent = _PLAN_DEV.get(id(plan))
    if (ent is None or ent[0] is not plan
            or isinstance(ent[1], jax.core.Tracer)):
        perm = jnp.asarray(plan.perm)
        tws = tuple(jnp.asarray(t) for t in plan.twiddles)
        if isinstance(perm, jax.core.Tracer) or any(
                isinstance(t, jax.core.Tracer) for t in tws):
            return perm, tws  # tracing: use, don't cache
        ent = (plan, perm, tws)
        _PLAN_DEV[id(plan)] = ent
    return ent[1], ent[2]


def ntt(df: DeviceField, a: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Forward NTT: a [n, 16] Montgomery coeffs -> evaluations at
    {omega^i} in natural order.

    The full stage pipeline is one jitted program per (field, n);
    twiddles/perm enter as arguments so the forward, inverse, and
    coset-extended plans of equal size share a single compiled
    executable."""
    n = plan.n
    perm, tws = _plan_dev(plan)
    key = (id(df), n)
    fn = _NTT_JIT.get(key)
    if fn is None:
        fn = jax.jit(lambda x, pm, *tw: _ntt_impl(df, x, pm, tw))
        _NTT_JIT[key] = fn
    return fn(a, perm, *tws)


def _ntt_impl(df: DeviceField, x: jnp.ndarray, perm: jnp.ndarray,
              tws) -> jnp.ndarray:
    n = x.shape[0]
    x = x[perm]
    for s, tw in enumerate(tws, start=1):
        m = 1 << s
        half = m // 2
        xr = x.reshape(n // m, m, NLIMBS)
        lo, hi = xr[:, :half], xr[:, half:]
        t = fmul(df, hi, tw[None])
        x = jnp.concatenate([fadd(df, lo, t), fsub(df, lo, t)],
                            axis=1).reshape(n, NLIMBS)
    return x


def _ntt_impl_b(df: DeviceField, x: jnp.ndarray, perm: jnp.ndarray,
                tws) -> jnp.ndarray:
    """Batched stage pipeline: x [m, n, 16], transform along axis 1 —
    m independent NTTs fused in one program (per-phase column batches)."""
    m, n = x.shape[0], x.shape[1]
    x = x[:, perm]
    for s, tw in enumerate(tws, start=1):
        mm = 1 << s
        half = mm // 2
        xr = x.reshape(m, n // mm, mm, NLIMBS)
        lo, hi = xr[:, :, :half], xr[:, :, half:]
        t = fmul(df, hi, tw[None, None])
        x = jnp.concatenate([fadd(df, lo, t), fsub(df, lo, t)],
                            axis=2).reshape(m, n, NLIMBS)
    return x


def ntt_many(df: DeviceField, x: jnp.ndarray, plan: NttPlan) -> jnp.ndarray:
    """Batched forward NTT [m, n, 16] along axis 1 (one jitted stage
    pipeline per (field, n, m))."""
    key = (id(df), plan.n, "many", x.shape[0])
    perm, tws = _plan_dev(plan)
    fn = _NTT_JIT.get(key)
    if fn is None:
        fn = jax.jit(lambda v, pm, *tw: _ntt_impl_b(df, v, pm, tw))
        _NTT_JIT[key] = fn
    return fn(x, perm, *tws)


def make_inv_plan(df: DeviceField, plan: NttPlan) -> tuple[NttPlan, jnp.ndarray]:
    """Inverse plan + n^{-1} scale factor (mont limbs)."""
    p = df.spec.modulus
    omega_inv = pow(plan.omega, p - 2, p)
    n_inv = pow(plan.n, p - 2, p)
    return (make_plan(df, plan.n, omega_inv),
            jnp.asarray(int_to_limbs(n_inv * (1 << 256) % p)))


def intt(df: DeviceField, a: jnp.ndarray, inv_plan: NttPlan,
         n_inv_mont: jnp.ndarray) -> jnp.ndarray:
    x = ntt(df, a, inv_plan)
    return fmul(df, x, jnp.broadcast_to(n_inv_mont, x.shape))


def _digits16(v: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)


def group_ntt(cv: DeviceCurve, pts: JPoint, plan: NttPlan) -> JPoint:
    """NTT over curve points: same butterflies, twiddle multiply becomes a
    per-lane scalar multiplication (reference FftGroup over curve groups,
    arithmetic.rs:17-27; used to build g_lagrange)."""
    n = plan.n
    perm = jnp.asarray(plan.perm)
    x = JPoint(pts.x[perm], pts.y[perm], pts.z[perm])
    for s, exps in enumerate(plan.twiddle_exps, start=1):
        m = 1 << s
        half = m // 2
        def rs(a):
            return a.reshape(n // m, m, NLIMBS)
        lo = JPoint(rs(x.x)[:, :half], rs(x.y)[:, :half], rs(x.z)[:, :half])
        hi = JPoint(rs(x.x)[:, half:], rs(x.y)[:, half:], rs(x.z)[:, half:])
        digits = np.stack([_digits16(e) for e in exps])  # [half, 16]
        dig = jnp.broadcast_to(jnp.asarray(digits)[None], (n // m, half, 16))
        # max twiddle exponent < p < 2^255
        t = batch_scalar_mul(cv, hi, dig, nbits=255)
        top = padd(cv, lo, t)
        from ..curves.device import pneg
        bot = padd(cv, lo, pneg(cv, t))
        x = JPoint(
            jnp.concatenate([top.x, bot.x], axis=1).reshape(n, NLIMBS),
            jnp.concatenate([top.y, bot.y], axis=1).reshape(n, NLIMBS),
            jnp.concatenate([top.z, bot.z], axis=1).reshape(n, NLIMBS))
    return x
