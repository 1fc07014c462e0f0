"""Multi-scalar multiplication (Pippenger) as a TPU device program.

Replaces the reference's thread-parallel bucket MSM (`best_multiexp`,
halo2_proofs/src/arithmetic.rs:143-180) with a sort + segmented-scan
formulation that has no scalar loops:

  per 8-bit window (lax.scan over the 32 windows, Horner-combined with 8
  doublings between windows):
    1. sort points by window digit          (jnp.argsort — XLA sort)
    2. segmented associative_scan group-add (log-depth, branchless padd)
    3. scatter last-of-segment into buckets (unique indices by construction)
    4. suffix-sum buckets (reverse associative_scan) + log-depth tree sum
       == summation by parts (`Buckets::sum`, arithmetic.rs:74-93)

The group law is exact integer arithmetic, so any evaluation order gives
bit-identical results — the schedule is free, only the result must match
(`test_multiexp` oracle, arithmetic.rs:440-458).

Multi-chip: shard points/scalars along n, run this per shard, reduce the
32 per-window partials (or the final point) with a group-add psum — see
halo2_tpu/parallel.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import DeviceField, NLIMBS, from_mont
from ..curves.device import (DeviceCurve, JPoint, padd, pdouble, pselect,
                             tree_sum)

WINDOW_BITS = 8
NUM_WINDOWS = 32  # 256 / 8
NUM_BUCKETS = 1 << WINDOW_BITS  # digit range; bucket 0 unused


def scalar_window_digits(scalar_digits16: jnp.ndarray) -> jnp.ndarray:
    """Canonical 16-bit digit array [n, 16] -> [NUM_WINDOWS, n] of 8-bit
    window digits (LSB window first)."""
    lo = scalar_digits16 & 0xFF
    hi = scalar_digits16 >> 8
    inter = jnp.stack([lo, hi], axis=-1).reshape(
        scalar_digits16.shape[0], NUM_WINDOWS)
    return inter.T


def _window_sum(cv: DeviceCurve, digits: jnp.ndarray, pts: JPoint) -> JPoint:
    """Sum_i digit_i * P_i for 8-bit digits via sorted segmented scan."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    ds = digits[order]
    P = JPoint(pts.x[order], pts.y[order], pts.z[order])

    # start-of-segment flags
    prev = jnp.concatenate([jnp.full((1,), 0xFFFFFFFF, ds.dtype), ds[:-1]])
    start = (ds != prev)

    def combine(a, b):
        pa, fa = a
        pb, fb = b
        merged = padd(cv, pa, pb)
        out = pselect(fb.astype(jnp.bool_), pb, merged)
        return (out, fa | fb)

    scanned, _ = jax.lax.associative_scan(
        combine, (P, start.astype(jnp.uint32)), axis=0)

    nxt = jnp.concatenate([ds[1:], jnp.full((1,), 0xFFFFFFFF, ds.dtype)])
    is_last = ds != nxt
    # each segment has exactly one last element -> unique scatter targets;
    # digit 0 and non-last entries go to the dump slot NUM_BUCKETS.
    target = jnp.where(is_last & (ds > 0), ds, NUM_BUCKETS).astype(jnp.int32)

    ident = cv.identity((NUM_BUCKETS + 1,))
    buckets = JPoint(
        ident.x.at[target].set(scanned.x),
        ident.y.at[target].set(scanned.y),
        ident.z.at[target].set(scanned.z),
    )
    b = JPoint(buckets.x[1:NUM_BUCKETS], buckets.y[1:NUM_BUCKETS],
               buckets.z[1:NUM_BUCKETS])  # buckets 1..255
    suffix = jax.lax.associative_scan(lambda u, v: padd(cv, u, v), b,
                                      axis=0, reverse=True)
    return tree_sum(cv, suffix, axis=0)


# Below this size the Pippenger machinery costs more (in XLA graph size
# and sort overhead) than it saves: use batched double-and-add + tree
# reduction (the `small_multiexp` analogue, arithmetic.rs:116-136).
import os as _os_t
SMALL_MSM_THRESHOLD = int(_os_t.environ.get(
    "HALO2_TPU_SMALL_MSM_THRESHOLD", "2048"))

# Below this size, when inputs are concrete (not under jit), exact host
# integer arithmetic beats the device round-trip (and avoids compiling
# the point-loop graphs at all on test-scale inputs). Tune with
# HALO2_TPU_HOST_MSM_THRESHOLD=0 to force the device path everywhere.
import os as _os
HOST_MSM_THRESHOLD = int(_os.environ.get("HALO2_TPU_HOST_MSM_THRESHOLD",
                                         "512"))


def _is_concrete(*arrays) -> bool:
    import jax.core
    return not any(isinstance(a, jax.core.Tracer) for a in arrays)


def _msm_host(cv: DeviceCurve, scalar_digits16, pts: JPoint) -> JPoint:
    """Exact host MSM on small concrete inputs."""
    import numpy as np
    digits = np.asarray(scalar_digits16)
    scalars = [int(sum(int(d) << (16 * i) for i, d in enumerate(row)))
               for row in digits]
    host_pts = cv.points_from_device(pts)
    total = cv.spec.msm(scalars, host_pts)
    jp = cv.points_to_device([total])
    return JPoint(jp.x[0], jp.y[0], jp.z[0])


def _pad_pow2(cv: DeviceCurve, scalar_digits16, pts: JPoint, min_n=8):
    """Pad to the next power of two with zero scalars / identity points so
    MSM shapes bucket into log-many compile cache entries."""
    n = scalar_digits16.shape[0]
    target = max(min_n, 1 << (n - 1).bit_length())
    if target == n:
        return scalar_digits16, pts
    pad = target - n
    digits = jnp.concatenate(
        [scalar_digits16, jnp.zeros((pad, 16), scalar_digits16.dtype)],
        axis=0)
    ident = cv.identity((pad,))
    pts = JPoint(jnp.concatenate([pts.x, ident.x], axis=0),
                 jnp.concatenate([pts.y, ident.y], axis=0),
                 jnp.concatenate([pts.z, ident.z], axis=0))
    return digits, pts


def msm_small(cv: DeviceCurve, scalar_digits16: jnp.ndarray,
              pts: JPoint) -> JPoint:
    """Batched per-lane double-and-add, then log-depth tree reduction.
    Small traced graph (one fori_loop body + log n adds)."""
    from ..curves.device import batch_scalar_mul
    prods = batch_scalar_mul(cv, pts, scalar_digits16, nbits=256)
    return tree_sum(cv, prods, axis=0)


def _jpoint_to_proj(cv: DeviceCurve, pts: JPoint) -> jnp.ndarray:
    """JPoint batch [n] (Jacobian, Z=0 identity) -> [48, n] projective
    (X·Z, Y, Z³): x = X/Z² = XZ/Z³, y = Y/Z³. Z ∈ {0, R} (affine/identity
    batches, the common case) needs no muls but the general form is kept
    for arbitrary Jacobian inputs."""
    from ..fields.device import fmul
    f = cv.base
    z2 = fmul(f, pts.z, pts.z)
    return jnp.concatenate([
        fmul(f, pts.x, pts.z).T,
        pts.y.T,
        fmul(f, z2, pts.z).T,
    ], axis=0)


def _proj_point_to_jpoint(cv: DeviceCurve, pt) -> JPoint:
    """Affine host point (or None) -> single JPoint."""
    jp = cv.points_to_device([pt])
    return JPoint(jp.x[0], jp.y[0], jp.z[0])


def msm_pallas_path(cv: DeviceCurve, scalar_digits16: jnp.ndarray,
                    pts: JPoint, device_combine: bool,
                    assume_affine: bool = False) -> JPoint:
    """Pippenger on the Pallas point kernels (ops/msm_pallas.py).

    assume_affine: caller guarantees pts are affine/identity (Z in
    {0, mont 1}), e.g. SRS shards — enables mixed bucket adds."""
    from . import msm_pallas as mp
    proj = _jpoint_to_proj(cv, pts)
    aff = proj[:32] if assume_affine else None
    if device_combine:
        wsums, c = mp.msm_pallas_window_sums(cv.spec, cv.base,
                                             scalar_digits16, proj,
                                             aff=aff)
        out = mp.device_horner_combine(cv.base, wsums, c)
        # projective [48] -> Jacobian JPoint: (XZ, YZ², Z) has the same
        # affine image; cheaper: x_j = X·Z, y_j = Y·Z², z_j = Z.
        from ..fields.device import fmul
        f = cv.base
        X, Y, Z = out[:16], out[16:32], out[32:48]
        z2 = fmul(f, Z, Z)
        return JPoint(fmul(f, X, Z), fmul(f, Y, z2), Z)
    res = mp.msm_pallas(cv.spec, cv.base, scalar_digits16, proj, aff=aff)
    return _proj_point_to_jpoint(cv, res)


# Eagerly-dispatched MSMs (the interactive prover/verifier path): the
# whole device program — optional mont->canonical conversion, pow2
# padding, projective conversion, Pippenger window sums — runs as ONE
# jitted dispatch per (curve, n) instead of ~100 eager op round-trips
# (each ~40 ms on a tunneled device).  The host then reads back the
# [48, W] window sums and Horner-combines (tiny serial group math).
_EAGER_WSUMS_JIT: dict = {}


def _msm_eager(cv: DeviceCurve, scalars: jnp.ndarray, pts: JPoint,
               is_mont: bool) -> JPoint:
    from . import msm_pallas as mp
    from .pallas_point import _interpret_default
    n = scalars.shape[0]
    padded_n = max(8, 1 << (n - 1).bit_length())
    c = mp.pick_c(padded_n)
    interpret = _interpret_default()
    key = (id(cv), n, c, is_mont, interpret)
    fn = _EAGER_WSUMS_JIT.get(key)
    if fn is None:
        def impl(s, x, y, z):
            d16 = from_mont(cv.scalar, s) if is_mont else s
            d16, p = _pad_pow2(cv, d16, JPoint(x, y, z))
            proj = _jpoint_to_proj(cv, p)
            w, _ = mp.msm_pallas_window_sums(cv.spec, cv.base, d16, proj,
                                             c, interpret=interpret)
            return w
        fn = jax.jit(impl)
        _EAGER_WSUMS_JIT[key] = fn
    wsums = fn(scalars, pts.x, pts.y, pts.z)
    window_pts = mp.points_from_proj(cv.spec, cv.base, wsums)
    res = mp.host_horner_combine(cv.spec, window_pts, c)
    return _proj_point_to_jpoint(cv, res)


# Use the Pallas Pippenger for device MSMs above this size (set to a huge
# value to fall back to the round-1 scan/ladder paths).
PALLAS_MSM_THRESHOLD = int(_os.environ.get(
    "HALO2_TPU_PALLAS_MSM_THRESHOLD", "512"))


def msm(cv: DeviceCurve, scalar_digits16: jnp.ndarray, pts: JPoint,
        assume_affine: bool = False) -> JPoint:
    """MSM: scalars as canonical (non-Montgomery) 16-bit digit arrays
    [n, 16], points as a JPoint batch [n]. Returns a single JPoint."""
    concrete = _is_concrete(scalar_digits16, pts.x, pts.y, pts.z)
    if scalar_digits16.shape[0] <= HOST_MSM_THRESHOLD and concrete:
        return _msm_host(cv, scalar_digits16, pts)
    if concrete and scalar_digits16.shape[0] > PALLAS_MSM_THRESHOLD:
        return _msm_eager(cv, scalar_digits16, pts, is_mont=False)
    scalar_digits16, pts = _pad_pow2(cv, scalar_digits16, pts)
    if scalar_digits16.shape[0] > PALLAS_MSM_THRESHOLD:
        return msm_pallas_path(cv, scalar_digits16, pts,
                               device_combine=not concrete,
                               assume_affine=assume_affine)
    if scalar_digits16.shape[0] <= SMALL_MSM_THRESHOLD:
        return msm_small(cv, scalar_digits16, pts)
    windows = scalar_window_digits(scalar_digits16)  # [32, n] LSB first
    windows_msb = windows[::-1]

    def body(carry, digits_w):
        for _ in range(WINDOW_BITS):
            carry = pdouble(cv, carry)
        w = _window_sum(cv, digits_w, pts)
        return padd(cv, carry, w), None

    out, _ = jax.lax.scan(body, cv.identity(()), windows_msb)
    return out


def scalars_to_digits(df: DeviceField, scalars_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form field array [n,16] -> canonical digit array [n,16]."""
    return from_mont(df, scalars_mont)


def msm_mont(cv: DeviceCurve, scalars_mont: jnp.ndarray, pts: JPoint) -> JPoint:
    """MSM taking Montgomery-form scalars (the common case: polynomial
    coefficients live in Montgomery form on device)."""
    if (_is_concrete(scalars_mont, pts.x, pts.y, pts.z)
            and scalars_mont.shape[0] > max(HOST_MSM_THRESHOLD,
                                            PALLAS_MSM_THRESHOLD)):
        return _msm_eager(cv, scalars_mont, pts, is_mont=True)
    return msm(cv, scalars_to_digits(cv.scalar, scalars_mont), pts)
