"""Device (JAX/TPU) Pasta curve arithmetic on Jacobian limb arrays.

A batch of points is a `JPoint` pytree of three uint32 [..., 16] arrays
(X, Y, Z) in Montgomery form, Jacobian coordinates; Z == 0 encodes the
identity. The group law is fully branchless (jnp.where selects between the
generic-add, double, identity and mixed cases), so `JPoint` batches flow
through `lax.associative_scan`, `vmap` and collectives unchanged — this is
what makes segmented-scan MSM and group-valued NTT possible on TPU.

Replaces the reference's CPU point arithmetic (pasta_curves `group` impls
used throughout halo2_proofs/src/arithmetic.rs). Curve: y^2 = x^3 + 5
(a = 0), identical for Pallas and Vesta up to the base field.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, FP_DEV, FQ_DEV, NLIMBS, fadd, fsub,
                             fmul, fsquare, fneg, finv, batch_inv, fselect,
                             is_zero, int_to_limbs)
from .host import CurveSpec, PALLAS, VESTA


class JPoint(NamedTuple):
    """Jacobian point batch: x = X/Z^2, y = Y/Z^3; Z == 0 is the identity."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


class DeviceCurve:
    """Static curve context pairing a host CurveSpec with its device base
    field. Hashable/identity-stable so jitted closures cache properly."""

    def __init__(self, spec: CurveSpec, base_dev: DeviceField,
                 scalar_dev: DeviceField):
        self.spec = spec
        self.base = base_dev
        self.scalar = scalar_dev

    # ---- host <-> device ----
    def points_to_device(self, pts) -> JPoint:
        """List of affine host points (None = identity) -> JPoint batch."""
        n = len(pts)
        xs, ys, zs = [], [], []
        for pt in pts:
            if pt is None:
                xs.append(0); ys.append(1); zs.append(0)
            else:
                xs.append(pt[0]); ys.append(pt[1]); zs.append(1)
        return JPoint(
            jnp.asarray(self.base.to_mont_np(xs)),
            jnp.asarray(self.base.to_mont_np(ys)),
            jnp.asarray(self.base.to_mont_np(zs)),
        )

    def points_from_device(self, jp: JPoint):
        """JPoint batch [n] -> list of affine host points."""
        xs = self.base.from_mont_np(np.asarray(jp.x))
        ys = self.base.from_mont_np(np.asarray(jp.y))
        zs = self.base.from_mont_np(np.asarray(jp.z))
        out = []
        p = self.spec.base.modulus
        flat = zip(np.ravel(xs), np.ravel(ys), np.ravel(zs))
        for x, y, z in flat:
            x, y, z = int(x), int(y), int(z)
            if z == 0:
                out.append(None)
            else:
                zinv = pow(z, p - 2, p)
                zi2 = zinv * zinv % p
                out.append((x * zi2 % p, y * zi2 * zinv % p))
        return out

    def identity(self, shape=()) -> JPoint:
        return JPoint(self.base.zeros(shape), self.base.ones(shape),
                      self.base.zeros(shape))


PALLAS_DEV = DeviceCurve(PALLAS, FP_DEV, FQ_DEV)
VESTA_DEV = DeviceCurve(VESTA, FQ_DEV, FP_DEV)


def pdouble(cv: DeviceCurve, a: JPoint) -> JPoint:
    """Jacobian doubling, a = 0 curve (dbl-2009-l). Identity-safe:
    Z=0 -> Z3=0."""
    f = cv.base
    A = fsquare(f, a.x)
    B = fsquare(f, a.y)
    C = fsquare(f, B)
    t = fsquare(f, fadd(f, a.x, B))
    D = fsub(f, fsub(f, t, A), C)
    D = fadd(f, D, D)
    E = fadd(f, fadd(f, A, A), A)
    F = fsquare(f, E)
    X3 = fsub(f, F, fadd(f, D, D))
    C8 = fadd(f, C, C); C8 = fadd(f, C8, C8); C8 = fadd(f, C8, C8)
    Y3 = fsub(f, fmul(f, E, fsub(f, D, X3)), C8)
    Z3 = fmul(f, fadd(f, a.y, a.y), a.z)
    return JPoint(X3, Y3, Z3)


def padd(cv: DeviceCurve, a: JPoint, b: JPoint) -> JPoint:
    """Complete branchless Jacobian addition (add-2007-bl core with
    where-selected edge cases: identity operands, doubling, inverses)."""
    f = cv.base
    z1z1 = fsquare(f, a.z)
    z2z2 = fsquare(f, b.z)
    u1 = fmul(f, a.x, z2z2)
    u2 = fmul(f, b.x, z1z1)
    s1 = fmul(f, fmul(f, a.y, b.z), z2z2)
    s2 = fmul(f, fmul(f, b.y, a.z), z1z1)
    h = fsub(f, u2, u1)
    r = fsub(f, s2, s1)
    hh = fsquare(f, h)
    hhh = fmul(f, hh, h)
    v = fmul(f, u1, hh)
    x3 = fsub(f, fsub(f, fsquare(f, r), hhh), fadd(f, v, v))
    y3 = fsub(f, fmul(f, r, fsub(f, v, x3)), fmul(f, s1, hhh))
    z3 = fmul(f, fmul(f, a.z, b.z), h)
    added = JPoint(x3, y3, z3)

    a_inf = is_zero(f, a.z)
    b_inf = is_zero(f, b.z)
    h_zero = is_zero(f, h)
    r_zero = is_zero(f, r)

    dbl = pdouble(cv, a)
    idn = cv.identity(a.z.shape[:-1])
    # same x: double if same y else identity
    samex = jax.tree.map(lambda d, i: fselect(r_zero, d, i), dbl, idn)
    gen = jax.tree.map(lambda s, ad: fselect(h_zero, s, ad), samex, added)
    res = jax.tree.map(lambda g, bb: fselect(a_inf, bb, g), gen, b)
    res = jax.tree.map(lambda r_, aa: fselect(b_inf, aa, r_), res, a)
    return JPoint(*res)


def pneg(cv: DeviceCurve, a: JPoint) -> JPoint:
    return JPoint(a.x, fneg(cv.base, a.y), a.z)


def pselect(cond, a: JPoint, b: JPoint) -> JPoint:
    """cond: bool [...]; where(cond, a, b) over point batches."""
    return JPoint(*(fselect(cond, x, y) for x, y in zip(a, b)))


def batch_scalar_mul(cv: DeviceCurve, pts: JPoint, scalar_digits,
                     nbits: int = 256) -> JPoint:
    """Per-lane variable-base scalar mul: pts [n] points, scalar_digits
    uint32 [n, 16] canonical (NOT Montgomery) 16-bit digits of the scalars.
    MSB-first double-and-(masked)-add via fori_loop; 255 sequential rounds
    of fully vectorized group ops."""
    def body(i, acc):
        bit_idx = nbits - 1 - i
        limb = bit_idx // 16
        off = (bit_idx % 16).astype(jnp.uint32)
        digit = jax.lax.dynamic_index_in_dim(scalar_digits, limb, axis=-1,
                                             keepdims=False)
        bit = (digit >> off) & 1
        acc = pdouble(cv, acc)
        added = padd(cv, acc, pts)
        return pselect(bit.astype(jnp.bool_), added, acc)

    init = cv.identity(pts.z.shape[:-1])
    return jax.lax.fori_loop(0, nbits, body, init)


def normalize(cv: DeviceCurve, pts: JPoint) -> JPoint:
    """Batch-normalize Jacobian -> affine-with-Z∈{0,1} using one batched
    inversion (the device analogue of parallel batch normalization in
    commitment.rs:67-100 / commitment/prover.rs:154-166)."""
    f = cv.base
    inf = is_zero(f, pts.z)
    zsafe = fselect(inf, cv.base.ones(pts.z.shape[:-1]), pts.z)
    flatz = zsafe.reshape(-1, NLIMBS)
    zinv = batch_inv(f, flatz, axis=0).reshape(zsafe.shape)
    zi2 = fsquare(f, zinv)
    zi3 = fmul(f, zi2, zinv)
    x = fmul(f, pts.x, zi2)
    y = fmul(f, pts.y, zi3)
    one = cv.base.ones(pts.z.shape[:-1])
    zero = cv.base.zeros(pts.z.shape[:-1])
    return JPoint(fselect(inf, zero, x), fselect(inf, one, y),
                  fselect(inf, zero, one))


def tree_sum(cv: DeviceCurve, pts: JPoint, axis: int = 0) -> JPoint:
    """Log-depth reduction (group add) along an axis. Pads with identity."""
    n = pts.z.shape[axis]
    cur = pts
    while n > 1:
        half = (n + 1) // 2
        if n % 2 == 1:
            pad = cv.identity(())
            def cat(arr, padarr):
                shp = list(arr.shape)
                shp[axis] = 1
                p = jnp.broadcast_to(
                    padarr.reshape((1,) * (len(shp) - 1) + (NLIMBS,)), shp)
                return jnp.concatenate([arr, p], axis=axis)
            cur = JPoint(cat(cur.x, pad.x), cat(cur.y, pad.y),
                         cat(cur.z, pad.z))
            n += 1
        def take(arr, lo, hi):
            idx = [slice(None)] * arr.ndim
            idx[axis] = slice(lo, hi)
            return arr[tuple(idx)]
        a = JPoint(take(cur.x, 0, half), take(cur.y, 0, half),
                   take(cur.z, 0, half))
        b = JPoint(take(cur.x, half, n), take(cur.y, half, n),
                   take(cur.z, half, n))
        cur = padd(cv, a, b)
        n = half
    # squeeze the axis
    def sq(arr):
        idx = [slice(None)] * arr.ndim
        idx[axis] = 0
        return arr[tuple(idx)]
    return JPoint(sq(cur.x), sq(cur.y), sq(cur.z))
