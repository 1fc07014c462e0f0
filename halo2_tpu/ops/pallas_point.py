"""Pallas TPU kernels for Pasta curve point arithmetic (projective, complete).

Replaces the branchy Jacobian device formulas (curves/device.py) on the
MSM hot path with the Renes-Costello-Batina 2015 *complete* addition law
for short-Weierstrass curves with a = 0 (Algorithms 7/9 of eprint
2015/1060): 12M + 2·(b3-mul) adds, 6M+2S doubles, identity = (0:1:0),
no branches at all — so point batches flow through segmented scans and
tree reductions with a plain select on the flag, and the whole formula
compiles to one straight-line Mosaic kernel.

Layout: a point batch is ONE uint32 array [48, M, 128]:
rows 0..15 = X limbs, 16..31 = Y, 32..47 = Z (16-bit Montgomery digits,
little-endian — fields/device.py convention). Every per-limb value inside
the kernel is an (SUB, 128) tile, so the VPU runs fully occupied (the
round-1 [16, N] layout put limb rows on 1-D vectors = 1/8 sublane use).

Reference behavior reproduced: pasta_curves group ops (the substrate of
halo2_proofs/src/arithmetic.rs MSM/FFT); results are bit-identical group
elements — only the evaluation schedule differs (SURVEY.md §7.4).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import DeviceField, NLIMBS, MASK, LIMB_BITS, int_to_limbs
from ..curves.host import CurveSpec

LANES = 128
SUB = 8          # sublane tile rows per block
BLOCK = SUB * LANES  # 1024 points per grid step

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# in-kernel field arithmetic on limb lists (each limb an identical-shape tile)
# ---------------------------------------------------------------------------

def _k_add(df: DeviceField, a, b):
    """(a + b) mod p on 16-limb lists."""
    p = df.p_limbs
    out, c = [], None
    for i in range(NLIMBS):
        t = a[i] + b[i] + (c if c is not None else 0)
        out.append(t & MASK)
        c = t >> LIMB_BITS
    d, borrow = [], None
    for i in range(NLIMBS):
        t = out[i] + U32(1 << LIMB_BITS) - p[i] - (borrow if borrow is not None else 0)
        d.append(t & MASK)
        borrow = U32(1) - (t >> LIMB_BITS)
    use_d = (c | (U32(1) - borrow)).astype(jnp.bool_)
    return [jnp.where(use_d, x, y) for x, y in zip(d, out)]


def _k_sub(df: DeviceField, a, b):
    p = df.p_limbs
    out, borrow = [], None
    for i in range(NLIMBS):
        t = a[i] + U32(1 << LIMB_BITS) - b[i] - (borrow if borrow is not None else 0)
        out.append(t & MASK)
        borrow = U32(1) - (t >> LIMB_BITS)
    dp, c = [], None
    for i in range(NLIMBS):
        t = out[i] + p[i] + (c if c is not None else 0)
        dp.append(t & MASK)
        c = t >> LIMB_BITS
    use_dp = borrow.astype(jnp.bool_)
    return [jnp.where(use_dp, x, y) for x, y in zip(dp, out)]


def _ksub_raw(a, b):
    """Plain limb subtract a − b (no modular correction): valid when
    a ≥ b, e.g. p − y for y ∈ (0, p)."""
    out, borrow = [], None
    for i in range(NLIMBS):
        t = (a[i] + U32(1 << LIMB_BITS) - b[i]
             - (borrow if borrow is not None else 0))
        out.append(t & MASK)
        borrow = U32(1) - (t >> LIMB_BITS)
    return out, borrow


def _k_mul15(df: DeviceField, a):
    """15·a mod p = 16a - a via four modular doublings and a subtract
    (b3 = 3·b = 15 for the Pasta curves; linear, so Montgomery-form safe)."""
    x = _k_add(df, a, a)
    x = _k_add(df, x, x)
    x = _k_add(df, x, x)
    x = _k_add(df, x, x)
    return _k_sub(df, x, a)


def _k_mul(df: DeviceField, a, b):
    """Montgomery product on 16-limb lists (CIOS, 16-bit digits)."""
    p = df.p_limbs
    n0 = df.n0
    nz = [j for j in range(1, NLIMBS) if p[j] != 0]
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            prod = a[i] * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    c = zero
    for i in range(NLIMBS):
        t = cols[i] + c
        m = (t * n0) & MASK
        mp0 = m * p[0]
        u = t + (mp0 & MASK)
        c = (u >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        for j in nz:
            prod = m * p[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    out = []
    for i in range(NLIMBS):
        t = cols[NLIMBS + i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    d, borrow = [], None
    for i in range(NLIMBS):
        t = out[i] + U32(1 << LIMB_BITS) - p[i] - (borrow if borrow is not None else 0)
        d.append(t & MASK)
        borrow = U32(1) - (t >> LIMB_BITS)
    use_d = (c | (U32(1) - borrow)).astype(jnp.bool_)
    return [jnp.where(use_d, x, y) for x, y in zip(d, out)]


def _k_select(cond, a, b):
    """cond: bool tile; per-limb where."""
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _k_is_zero(a):
    acc = a[0]
    for i in range(1, NLIMBS):
        acc = acc | a[i]
    return acc == 0


# ---------------------------------------------------------------------------
# complete projective group law (RCB15 Alg 7 / 9, a = 0, b3 = 15)
#
# The independent multiplies of each stage are stacked along the sublane
# axis and run through ONE CIOS pass: an add is 2 six-wide multiplies,
# a double is 2 four-wide multiplies. This keeps the Mosaic kernel at
# ~2k instructions (a fully inlined 12-multiply version takes minutes to
# compile) and runs every multiply at full VPU width.
# ---------------------------------------------------------------------------

def _stackn(xs):
    """List of k limb-lists -> one limb-list of k-stacked tiles."""
    return [jnp.concatenate([x[i] for x in xs], axis=0)
            for i in range(NLIMBS)]


def _unstackn(s, k):
    """Inverse of _stackn: limb-list of k-stacked tiles -> k limb-lists."""
    rows = s[0].shape[0] // k
    return [[l[j * rows:(j + 1) * rows] for l in s] for j in range(k)]


def _rcb_add(df: DeviceField, X1, Y1, Z1, X2, Y2, Z2):
    add = lambda a, b: _k_add(df, a, b)
    sub = lambda a, b: _k_sub(df, a, b)

    A = _stackn([X1, Y1, Z1, add(X1, Y1), add(Y1, Z1), add(X1, Z1)])
    B = _stackn([X2, Y2, Z2, add(X2, Y2), add(Y2, Z2), add(X2, Z2)])
    t0, t1, t2, m4, m5, m6 = _unstackn(_k_mul(df, A, B), 6)
    t3 = sub(sub(m4, t0), t1)      # X1Y2 + X2Y1
    t4 = sub(sub(m5, t1), t2)      # Y1Z2 + Y2Z1
    xz = sub(sub(m6, t0), t2)      # X1Z2 + X2Z1
    s0 = add(add(t0, t0), t0)      # 3 X1X2
    b3z = _k_mul15(df, t2)
    z3 = add(t1, b3z)
    s1 = sub(t1, b3z)
    y3 = _k_mul15(df, xz)
    A2 = _stackn([t3, t4, y3, s1, z3, s0])
    B2 = _stackn([s1, y3, s0, z3, t4, t3])
    p0, p1, p2, p3, p4, p5 = _unstackn(_k_mul(df, A2, B2), 6)
    X3 = sub(p0, p1)
    Y3 = add(p2, p3)
    Z3 = add(p4, p5)
    return X3, Y3, Z3


def _rcb_mixed_add(df: DeviceField, X1, Y1, Z1, X2, Y2):
    """RCB15 Alg 8 (a = 0, b3 = 15) — mixed add with an AFFINE second
    operand (Z2 = 1 implicit): 11 wide multiplies instead of 12, and the
    b3·Z1Z2 term becomes the 15·Z1 add-chain. Complete for every
    projective P1 (incl. identity) and every affine P2; affine arrays
    cannot encode the identity, so callers mask identity bases off
    (points_to_proj writes identity as (0, 1), which is not on either
    Pasta curve)."""
    add = lambda a, b: _k_add(df, a, b)
    sub = lambda a, b: _k_sub(df, a, b)

    A = _stackn([X1, Y1, add(X1, Y1), Y2, X2])
    B = _stackn([X2, Y2, add(X2, Y2), Z1, Z1])
    t0, t1, m2, yz, xzp = _unstackn(_k_mul(df, A, B), 5)
    t3 = sub(sub(m2, t0), t1)       # X1Y2 + X2Y1
    t4 = add(yz, Y1)                # Y1 + Y2 Z1
    xz = add(xzp, X1)               # X1 + X2 Z1
    s0 = add(add(t0, t0), t0)       # 3 X1X2
    b3z = _k_mul15(df, Z1)          # b3 Z1 Z2 = 15 Z1
    z3 = add(t1, b3z)
    s1 = sub(t1, b3z)
    y3 = _k_mul15(df, xz)
    A2 = _stackn([t3, t4, y3, s1, z3, s0])
    B2 = _stackn([s1, y3, s0, z3, t4, t3])
    p0, p1, p2, p3, p4, p5 = _unstackn(_k_mul(df, A2, B2), 6)
    X3 = sub(p0, p1)
    Y3 = add(p2, p3)
    Z3 = add(p4, p5)
    return X3, Y3, Z3


def _rcb_double(df: DeviceField, X, Y, Z):
    add = lambda a, b: _k_add(df, a, b)
    sub = lambda a, b: _k_sub(df, a, b)

    A = _stackn([Y, Y, Z, X])
    B = _stackn([Y, Z, Z, Y])
    t0, t1, zz, xy = _unstackn(_k_mul(df, A, B), 4)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)                # 8 Y^2
    t2 = _k_mul15(df, zz)           # b3 Z^2
    y3 = add(t0, t2)
    t2_3 = add(add(t2, t2), t2)
    t0p = sub(t0, t2_3)
    A2 = _stackn([t2, t1, t0p, t0p])
    B2 = _stackn([z3, z3, y3, xy])
    x3a, Z3, y3a, x3b = _unstackn(_k_mul(df, A2, B2), 4)
    Y3 = add(y3a, x3a)
    X3 = add(x3b, x3b)
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _split(ref_val):
    """[48, S, 128] value -> three 16-limb lists."""
    X = [ref_val[i] for i in range(NLIMBS)]
    Y = [ref_val[NLIMBS + i] for i in range(NLIMBS)]
    Z = [ref_val[2 * NLIMBS + i] for i in range(NLIMBS)]
    return X, Y, Z


def _store(out_ref, X, Y, Z):
    for i in range(NLIMBS):
        out_ref[i] = X[i]
        out_ref[NLIMBS + i] = Y[i]
        out_ref[2 * NLIMBS + i] = Z[i]


def _padd_kernel(df: DeviceField):
    def kernel(a_ref, b_ref, out_ref):
        X1, Y1, Z1 = _split(a_ref[:])
        X2, Y2, Z2 = _split(b_ref[:])
        _store(out_ref, *_rcb_add(df, X1, Y1, Z1, X2, Y2, Z2))
    return kernel


def _pdouble_kernel(df: DeviceField):
    def kernel(a_ref, out_ref):
        X, Y, Z = _split(a_ref[:])
        _store(out_ref, *_rcb_double(df, X, Y, Z))
    return kernel


def _padd_masked_kernel(df: DeviceField):
    """out = mask ? A + B : A — the bucket-accumulate step of the
    while-loop Pippenger (ops/msm.py): lanes whose bucket run is
    exhausted pass the accumulator through unchanged."""
    def kernel(a_ref, b_ref, m_ref, out_ref):
        X1, Y1, Z1 = _split(a_ref[:])
        X2, Y2, Z2 = _split(b_ref[:])
        X3, Y3, Z3 = _rcb_add(df, X1, Y1, Z1, X2, Y2, Z2)
        m = m_ref[:].astype(jnp.bool_)
        _store(out_ref,
               [jnp.where(m, u, v) for u, v in zip(X3, X1)],
               [jnp.where(m, u, v) for u, v in zip(Y3, Y1)],
               [jnp.where(m, u, v) for u, v in zip(Z3, Z1)])
    return kernel


def _pmixed_masked_kernel(df: DeviceField):
    """out = mask ? A ± B_affine : A — the mixed-add bucket-accumulate
    step (B is a [32, S, 128] affine batch; identity-coded (0, 1) bases
    are masked off in-kernel; s_ref selects the NEGATED base per lane —
    signed-digit Pippenger windows — via the free curve negation
    (x, p−y); y=0 would be 2-torsion, which the prime-order Pasta curves
    do not have)."""
    def kernel(a_ref, b_ref, m_ref, s_ref, out_ref):
        X1, Y1, Z1 = _split(a_ref[:])
        bv = b_ref[:]
        X2 = [bv[i] for i in range(NLIMBS)]
        Y2 = [bv[NLIMBS + i] for i in range(NLIMBS)]
        # identity base marker: X == 0 and Y == mont(1) (not a curve point)
        r_limbs = int_to_limbs(df.r_mod_p)
        x_zero = _k_is_zero(X2)
        y_one = None
        for i in range(NLIMBS):
            eq = Y2[i] == jnp.uint32(int(r_limbs[i]))
            y_one = eq if y_one is None else (y_one & eq)
        ident_b = x_zero & y_one
        neg = s_ref[:].astype(jnp.bool_)
        p_tiles = [jnp.full_like(Y2[0], l) for l in df.p_limbs]
        negY, _ = _ksub_raw(p_tiles, Y2)
        Y2 = [jnp.where(neg, u, v) for u, v in zip(negY, Y2)]
        X3, Y3, Z3 = _rcb_mixed_add(df, X1, Y1, Z1, X2, Y2)
        m = m_ref[:].astype(jnp.bool_) & (~ident_b)
        _store(out_ref,
               [jnp.where(m, u, v) for u, v in zip(X3, X1)],
               [jnp.where(m, u, v) for u, v in zip(Y3, Y1)],
               [jnp.where(m, u, v) for u, v in zip(Z3, Z1)])
    return kernel


def _pdouble_masked_kernel(df: DeviceField):
    """out = mask ? 2A : A — for batched per-lane doubling schedules."""
    def kernel(a_ref, m_ref, out_ref):
        X, Y, Z = _split(a_ref[:])
        X2, Y2, Z2 = _rcb_double(df, X, Y, Z)
        m = m_ref[:].astype(jnp.bool_)
        _store(out_ref,
               [jnp.where(m, u, v) for u, v in zip(X2, X)],
               [jnp.where(m, u, v) for u, v in zip(Y2, Y)],
               [jnp.where(m, u, v) for u, v in zip(Z2, Z)])
    return kernel


def _interpret_default() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


# ---------------------------------------------------------------------------
# jnp fallback (CPU tests / dryrun): same RCB formulas over the tensorized
# field ops of fields/device.py — XLA:CPU compiles the unrolled Pallas
# kernel body pathologically slowly (minutes), while the [..., 16, 16]
# outer-product formulation compiles in seconds. TPU always takes the
# Pallas path.
# ---------------------------------------------------------------------------

def _split2d(a):
    """[48, L] -> three [L, 16] field arrays."""
    return (jnp.transpose(a[:NLIMBS]), jnp.transpose(a[NLIMBS:2 * NLIMBS]),
            jnp.transpose(a[2 * NLIMBS:]))


def _join2d(X, Y, Z):
    return jnp.concatenate(
        [jnp.transpose(X), jnp.transpose(Y), jnp.transpose(Z)], axis=0)


def _mul15_arr(df, a):
    from ..fields.device import fadd, fsub
    x = fadd(df, a, a)
    x = fadd(df, x, x)
    x = fadd(df, x, x)
    x = fadd(df, x, x)
    return fsub(df, x, a)


def _rcb_add_arrays(df, A, B):
    """RCB Alg 7 on ([L,16],)*3 coordinate triples."""
    from ..fields.device import fmul, fadd, fsub
    X1, Y1, Z1 = A
    X2, Y2, Z2 = B
    mul = lambda a, b: fmul(df, a, b)
    add = lambda a, b: fadd(df, a, b)
    sub = lambda a, b: fsub(df, a, b)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    xz = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    s0 = add(add(t0, t0), t0)
    b3z = _mul15_arr(df, t2)
    z3 = add(t1, b3z)
    s1 = sub(t1, b3z)
    y3 = _mul15_arr(df, xz)
    X3 = sub(mul(t3, s1), mul(t4, y3))
    Y3 = add(mul(y3, s0), mul(s1, z3))
    Z3 = add(mul(z3, t4), mul(s0, t3))
    return X3, Y3, Z3


def _rcb_double_arrays(df, A):
    from ..fields.device import fmul, fadd, fsub
    X, Y, Z = A
    mul = lambda a, b: fmul(df, a, b)
    add = lambda a, b: fadd(df, a, b)
    sub = lambda a, b: fsub(df, a, b)
    t0 = mul(Y, Y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t1 = mul(Y, Z)
    t2 = _mul15_arr(df, mul(Z, Z))
    X3 = mul(t2, z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = add(mul(t0, Y3), X3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _build_padd(modulus: int, m: int, interpret: bool, seg: bool,
                sub: int = SUB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..fields.device import FP_DEV, FQ_DEV
    df = FP_DEV if modulus == FP_DEV.spec.modulus else FQ_DEV

    grid = (m // sub,)
    pt_spec = pl.BlockSpec((3 * NLIMBS, sub, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    fl_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    pt_shape = jax.ShapeDtypeStruct((3 * NLIMBS, m, LANES), jnp.uint32)
    fl_shape = jax.ShapeDtypeStruct((m, LANES), jnp.uint32)

    if seg:
        fn = pl.pallas_call(
            _padd_masked_kernel(df),
            out_shape=pt_shape,
            grid=grid,
            in_specs=[pt_spec, pt_spec, fl_spec],
            out_specs=pt_spec,
            interpret=interpret,
        )
    else:
        fn = pl.pallas_call(
            _padd_kernel(df),
            out_shape=pt_shape,
            grid=grid,
            in_specs=[pt_spec, pt_spec],
            out_specs=pt_spec,
            interpret=interpret,
        )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_pmixed(modulus: int, m: int, interpret: bool, sub: int = SUB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..fields.device import FP_DEV, FQ_DEV
    df = FP_DEV if modulus == FP_DEV.spec.modulus else FQ_DEV

    grid = (m // sub,)
    pt_spec = pl.BlockSpec((3 * NLIMBS, sub, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((2 * NLIMBS, sub, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    fl_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    pt_shape = jax.ShapeDtypeStruct((3 * NLIMBS, m, LANES), jnp.uint32)
    fn = pl.pallas_call(
        _pmixed_masked_kernel(df),
        out_shape=pt_shape,
        grid=grid,
        in_specs=[pt_spec, aff_spec, fl_spec, fl_spec],
        out_specs=pt_spec,
        interpret=interpret,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _build_pdouble(modulus: int, m: int, interpret: bool, masked: bool,
                   sub: int = SUB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..fields.device import FP_DEV, FQ_DEV
    df = FP_DEV if modulus == FP_DEV.spec.modulus else FQ_DEV

    grid = (m // sub,)
    pt_spec = pl.BlockSpec((3 * NLIMBS, sub, LANES), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    fl_spec = pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    pt_shape = jax.ShapeDtypeStruct((3 * NLIMBS, m, LANES), jnp.uint32)
    if masked:
        fn = pl.pallas_call(
            _pdouble_masked_kernel(df),
            out_shape=pt_shape,
            grid=grid,
            in_specs=[pt_spec, fl_spec],
            out_specs=pt_spec,
            interpret=interpret,
        )
    else:
        fn = pl.pallas_call(
            _pdouble_kernel(df),
            out_shape=pt_shape,
            grid=grid,
            in_specs=[pt_spec],
            out_specs=pt_spec,
            interpret=interpret,
        )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# flat [48, L] wrappers (pad L to a BLOCK multiple, reshape, call, unpad)
# ---------------------------------------------------------------------------

class PPoint(NamedTuple):
    """Projective point batch as one uint32 [48, L] array (x=X/Z, y=Y/Z,
    identity = (0:1:0) i.e. Z-limbs all zero)."""
    a: jnp.ndarray

    @property
    def n(self) -> int:
        return self.a.shape[1]


def _pad_flat(a: jnp.ndarray, ident_col: jnp.ndarray):
    l = a.shape[1]
    m = -(-l // BLOCK) * BLOCK
    if m != l:
        pad = jnp.broadcast_to(ident_col[:, None], (a.shape[0], m - l))
        a = jnp.concatenate([a, pad], axis=1)
    return a, l


def _ident_col(df: DeviceField) -> np.ndarray:
    """[48] uint32 column for the identity (0 : R : 0)."""
    col = np.zeros(3 * NLIMBS, dtype=np.uint32)
    col[NLIMBS:2 * NLIMBS] = int_to_limbs(df.r_mod_p)
    return col


@functools.lru_cache(maxsize=None)
def _ident_col_np(modulus: int) -> np.ndarray:
    from ..fields.device import FP_DEV, FQ_DEV
    df = FP_DEV if modulus == FP_DEV.spec.modulus else FQ_DEV
    return _ident_col(df)


def _ident_col_j(modulus: int) -> jnp.ndarray:
    # NOTE: returns a fresh jnp array each call — caching the device
    # array would leak tracers out of jit scopes.
    return jnp.asarray(_ident_col_np(modulus))


def _to3d(a: jnp.ndarray) -> jnp.ndarray:
    return a.reshape(a.shape[0], -1, LANES)


def _to2d(a: jnp.ndarray, l: int) -> jnp.ndarray:
    return a.reshape(a.shape[0], -1)[:, :l]


def padd_flat(df: DeviceField, a: jnp.ndarray, b: jnp.ndarray,
              interpret: bool | None = None) -> jnp.ndarray:
    """Complete projective add on [48, L] batches."""
    if interpret is None:
        interpret = _interpret_default()
    if interpret:
        out = _rcb_add_arrays(df, _split2d(a), _split2d(b))
        return _join2d(*out)
    ic = _ident_col_j(df.spec.modulus)
    a_, l = _pad_flat(a, ic)
    b_, _ = _pad_flat(b, ic)
    m = a_.shape[1] // LANES
    out = _build_padd(df.spec.modulus, m, False, seg=False)(
        _to3d(a_), _to3d(b_))
    return _to2d(out, l)


def padd_masked_flat(df: DeviceField, a, b, mask, interpret=None):
    """out = mask ? a + b : a on [48, L] batches (mask uint32/bool [L])."""
    if interpret is None:
        interpret = _interpret_default()
    if interpret:
        added = _rcb_add_arrays(df, _split2d(a), _split2d(b))
        m = mask.astype(jnp.bool_)[None, :]
        return jnp.where(
            jnp.broadcast_to(m, a.shape), _join2d(*added), a)
    ic = _ident_col_j(df.spec.modulus)
    a_, l = _pad_flat(a, ic)
    b_, _ = _pad_flat(b, ic)
    m = a_.shape[1] // LANES
    padf = m * LANES - l
    mk = mask.astype(jnp.uint32)
    if padf:
        mk = jnp.concatenate([mk, jnp.zeros((padf,), jnp.uint32)])
    out = _build_padd(df.spec.modulus, m, False, seg=True)(
        _to3d(a_), _to3d(b_), mk.reshape(-1, LANES))
    return _to2d(out, l)


def pmixed_masked_flat(df: DeviceField, a, b_aff, mask, signs=None,
                       interpret=None):
    """out = mask ? a ± b_aff : a on batches — a [48, L] projective,
    b_aff [32, L] affine (mixed RCB add, 11 wide muls). Identity-coded
    (0, 1) affine columns pass the accumulator through unchanged;
    signs [L] (0/1, optional) selects the negated base per lane."""
    if interpret is None:
        interpret = _interpret_default()
    if signs is None:
        signs = jnp.zeros(mask.shape, jnp.uint32)
    if interpret:
        # jnp fallback: the full complete add at Z2 = mont(1) computes
        # the identical values the mixed formulas do
        from ..fields.device import fneg
        r1 = jnp.asarray(int_to_limbs(df.r_mod_p), dtype=jnp.uint32)
        X2 = jnp.transpose(b_aff[:NLIMBS])
        Y2 = jnp.transpose(b_aff[NLIMBS:])
        ident_b = jnp.all(X2 == 0, axis=-1) & jnp.all(Y2 == r1[None, :],
                                                      axis=-1)
        Y2 = jnp.where(signs.astype(jnp.bool_)[:, None],
                       fneg(df, Y2), Y2)
        Z2 = jnp.where(ident_b[:, None], jnp.zeros_like(X2),
                       jnp.broadcast_to(r1[None, :], X2.shape))
        added = _rcb_add_arrays(df, _split2d(a), (X2, Y2, Z2))
        m = (mask.astype(jnp.bool_) & (~ident_b))[None, :]
        return jnp.where(jnp.broadcast_to(m, a.shape), _join2d(*added), a)
    ic = _ident_col_j(df.spec.modulus)
    a_, l = _pad_flat(a, ic)
    # pad affine columns with the identity marker (0, 1)
    lb = b_aff.shape[1]
    mtot = a_.shape[1]
    if mtot != lb:
        padc = np.zeros((2 * NLIMBS,), np.uint32)
        padc[NLIMBS:] = int_to_limbs(df.r_mod_p)
        pad = jnp.broadcast_to(jnp.asarray(padc)[:, None],
                               (2 * NLIMBS, mtot - lb))
        b_aff = jnp.concatenate([b_aff, pad], axis=1)
    m = a_.shape[1] // LANES
    padf = m * LANES - l
    mk = mask.astype(jnp.uint32)
    sg = signs.astype(jnp.uint32)
    if padf:
        mk = jnp.concatenate([mk, jnp.zeros((padf,), jnp.uint32)])
        sg = jnp.concatenate([sg, jnp.zeros((padf,), jnp.uint32)])
    out = _build_pmixed(df.spec.modulus, m, False)(
        _to3d(a_), _to3d(b_aff), mk.reshape(-1, LANES),
        sg.reshape(-1, LANES))
    return _to2d(out, l)


def pdouble_flat(df: DeviceField, a: jnp.ndarray,
                 interpret: bool | None = None) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    if interpret:
        return _join2d(*_rcb_double_arrays(df, _split2d(a)))
    ic = _ident_col_j(df.spec.modulus)
    a_, l = _pad_flat(a, ic)
    m = a_.shape[1] // LANES
    out = _build_pdouble(df.spec.modulus, m, False, masked=False)(
        _to3d(a_))
    return _to2d(out, l)


def pdouble_masked_flat(df: DeviceField, a: jnp.ndarray, mask: jnp.ndarray,
                        interpret: bool | None = None) -> jnp.ndarray:
    """mask uint32 [L]: out = mask ? 2a : a."""
    if interpret is None:
        interpret = _interpret_default()
    if interpret:
        dbl = _join2d(*_rcb_double_arrays(df, _split2d(a)))
        m = mask.astype(jnp.bool_)[None, :]
        return jnp.where(jnp.broadcast_to(m, a.shape), dbl, a)
    ic = _ident_col_j(df.spec.modulus)
    a_, l = _pad_flat(a, ic)
    m = a_.shape[1] // LANES
    padf = m * LANES - l
    mk = mask.astype(jnp.uint32)
    if padf:
        mk = jnp.concatenate([mk, jnp.zeros((padf,), jnp.uint32)])
    out = _build_pdouble(df.spec.modulus, m, interpret, masked=True)(
        _to3d(a_), mk.reshape(-1, LANES))
    return _to2d(out, l)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def points_to_proj(spec: CurveSpec, df: DeviceField, pts) -> jnp.ndarray:
    """List of affine host points (None = identity) -> [48, n] uint32."""
    n = len(pts)
    out = np.zeros((3 * NLIMBS, n), dtype=np.uint32)
    p = df.spec.modulus
    R = 1 << 256
    for k, pt in enumerate(pts):
        if pt is None:
            out[NLIMBS:2 * NLIMBS, k] = int_to_limbs(R % p)
        else:
            out[:NLIMBS, k] = int_to_limbs(pt[0] * R % p)
            out[NLIMBS:2 * NLIMBS, k] = int_to_limbs(pt[1] * R % p)
            out[2 * NLIMBS:, k] = int_to_limbs(R % p)
    return jnp.asarray(out)


def points_from_proj(spec: CurveSpec, df: DeviceField, arr) -> list:
    """[48, n] uint32 -> list of affine host points."""
    a = np.asarray(arr)
    p = df.spec.modulus
    rinv = pow(1 << 256, -1, p)
    from ..fields.device import limbs_to_int
    out = []
    for k in range(a.shape[1]):
        X = limbs_to_int(a[:NLIMBS, k]) * rinv % p
        Y = limbs_to_int(a[NLIMBS:2 * NLIMBS, k]) * rinv % p
        Z = limbs_to_int(a[2 * NLIMBS:, k]) * rinv % p
        if Z == 0:
            out.append(None)
        else:
            zi = pow(Z, -1, p)
            out.append((X * zi % p, Y * zi % p))
    return out
