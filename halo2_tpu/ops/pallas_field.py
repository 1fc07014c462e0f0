"""Pallas TPU kernel for the 255-bit Montgomery multiply.

The jnp field path (fields/device.py) emits ~300 HLO ops per multiply,
which is fine for fused elementwise pipelines but bloats graphs that scan
over point operations. This kernel collapses a multiply to ONE custom
call and uses the TPU-native layout:

  limbs-first [16, N]: 16-bit digits on the 8-sublane axis (16 = 2
  sublane tiles), field elements on the 128-lane axis — every partial
  product is a full-width lane-vector multiply on the VPU.

This is the round-2 integration target (PARITY.md perf plan); here it is
standalone with its own tests (interpret mode on CPU, compiled on TPU)
and a microbenchmark hook used to measure per-chip modmul
speed-of-light (BASELINE.md).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import DeviceField, NLIMBS, MASK, LIMB_BITS

LANES = 128


def _mont_mul_kernel(df: DeviceField):
    p = df.p_limbs
    n0 = df.n0
    nz = [j for j in range(1, NLIMBS) if p[j] != 0]

    def kernel(a_ref, b_ref, out_ref):
        a = [a_ref[i, :] for i in range(NLIMBS)]
        b = [b_ref[i, :] for i in range(NLIMBS)]
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
        # conditional subtract p (result < 2p)
        d = []
        borrow = jnp.zeros_like(out[0])
        for i in range(NLIMBS):
            t = out[i] + jnp.uint32(1 << LIMB_BITS) - p[i] - borrow
            d.append(t & MASK)
            borrow = jnp.uint32(1) - (t >> LIMB_BITS)
        use_d = (c | (jnp.uint32(1) - borrow)).astype(jnp.bool_)
        for i in range(NLIMBS):
            out_ref[i, :] = jnp.where(use_d, d[i], out[i])

    return kernel


@functools.lru_cache(maxsize=None)
def _build(modulus: int, n: int, interpret: bool):
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover
        vmem = None
    from ..fields.device import FP_DEV, FQ_DEV
    df = FP_DEV if modulus == FP_DEV.spec.modulus else FQ_DEV

    block = min(n, 512)
    assert n % block == 0
    grid = (n // block,)
    spec = (pl.BlockSpec((NLIMBS, block), lambda i: (0, i),
                         memory_space=vmem)
            if vmem is not None else
            pl.BlockSpec((NLIMBS, block), lambda i: (0, i)))

    fn = pl.pallas_call(
        _mont_mul_kernel(df),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )
    return jax.jit(fn)


def fmul_pallas(df: DeviceField, a_t: jnp.ndarray, b_t: jnp.ndarray,
                interpret: bool | None = None) -> jnp.ndarray:
    """Montgomery product on limbs-first [16, N] arrays (N % 128 == 0;
    N % 512 == 0 for the tiled path)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    n = a_t.shape[1]
    return _build(df.spec.modulus, n, interpret)(a_t, b_t)


def to_limbs_first(a: jnp.ndarray) -> jnp.ndarray:
    """[N, 16] -> [16, N]."""
    return jnp.transpose(a, (1, 0))


def from_limbs_first(a_t: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(a_t, (1, 0))


# ---------------------------------------------------------------------------
# limbs-first elementwise ops (adds/subs stay in XLA; they fuse fine)
# ---------------------------------------------------------------------------

def _unstack0(a):
    return [a[i] for i in range(NLIMBS)]


def _add_raw0(a, b):
    out, c = [], jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        t = a[i] + b[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return out, c


def _sub_raw0(a, b):
    out, borrow = [], jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        t = a[i] + jnp.uint32(1 << LIMB_BITS) - b[i] - borrow
        out.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return out, borrow


def fadd_t(df: DeviceField, a_t, b_t):
    """Modular add on limbs-first [16, ...] arrays."""
    s, carry = _add_raw0(_unstack0(a_t), _unstack0(b_t))
    p = [jnp.full_like(s[0], l) for l in df.p_limbs]
    d, borrow = _sub_raw0(s, p)
    use_d = (carry | (jnp.uint32(1) - borrow)).astype(jnp.bool_)
    return jnp.stack([jnp.where(use_d, x, y) for x, y in zip(d, s)],
                     axis=0)


def fsub_t(df: DeviceField, a_t, b_t):
    d, borrow = _sub_raw0(_unstack0(a_t), _unstack0(b_t))
    p = [jnp.full_like(d[0], l) for l in df.p_limbs]
    dp, _ = _add_raw0(d, p)
    use_dp = borrow.astype(jnp.bool_)
    return jnp.stack([jnp.where(use_dp, x, y) for x, y in zip(dp, d)],
                     axis=0)


def ntt_pallas(df: DeviceField, a_t, plan, interpret: bool | None = None):
    """Radix-2 NTT on a limbs-first [16, n] Montgomery array using the
    Pallas multiply for the butterfly twiddles (the round-2 hot path;
    plan from ops.ntt.make_plan)."""
    n = plan.n
    perm = jnp.asarray(plan.perm)
    x = a_t[:, perm]
    for s, tw in enumerate(plan.twiddles, start=1):
        m = 1 << s
        half = m // 2
        xr = x.reshape(NLIMBS, n // m, m)
        lo = xr[:, :, :half].reshape(NLIMBS, n // 2)
        hi = xr[:, :, half:].reshape(NLIMBS, n // 2)
        # twiddles [half, 16] -> limbs-first [16, half], repeated per
        # butterfly group: build [16, n//m, half] then flatten
        tw_t = jnp.transpose(jnp.asarray(tw), (1, 0))
        tw_full = jnp.broadcast_to(tw_t[:, None, :],
                                   (NLIMBS, n // m, half)
                                   ).reshape(NLIMBS, n // 2)
        t = fmul_pallas(df, hi, tw_full, interpret=interpret)
        top = fadd_t(df, lo, t)
        bot = fsub_t(df, lo, t)
        x = jnp.concatenate([
            top.reshape(NLIMBS, n // m, half),
            bot.reshape(NLIMBS, n // m, half)], axis=2).reshape(NLIMBS, n)
    return x
