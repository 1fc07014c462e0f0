"""MXU-matmul path for field multiplication by SHARED constants.

TPU-first observation: a 255-bit Montgomery multiply is 256 digit
products — elementwise work the VPU grinds through ~600 int-ops at a
time. But when MANY lanes multiply by the SAME constant c (exactly the
NTT's structure: every butterfly at position j of every block multiplies
by twiddle w_j), the product columns

    cols[k] = Σ_{i+j=k} a_i · c_j

become a matrix product  A[lanes, digits] @ W_c[digits, columns]  with a
PRECOMPUTED banded matrix W_c — i.e. the digit-product work moves onto
the MXU (the systolic array, where the chip's FLOPs actually are).

Exactness: digits are split to 8 bits so every f32 MAC is exact
(products <= 255², column sums <= 64·255² ≈ 2^22 < 2^24, inside the f32
mantissa). The matmul output feeds the SAME word-by-word Montgomery
reduction as the VPU path (`fields/device._mont_reduce_cols`), so
results are bit-identical to `fmul` (constants are stored in Montgomery
form: (aR)(cR)R^{-1} = acR).

Used by `ntt_mxu` — an NTT whose twiddle multiplies are G-grouped
batched matmuls ([G, nb, 32] @ [G, 32, 63]); enable in the domain
dispatch with HALO2_TPU_MXU_NTT=1.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, U32, MASK, LIMB_BITS,
                             _mont_reduce_cols)

D8 = 2 * NLIMBS          # 32 8-bit digits per element
COLS8 = 2 * D8 - 1       # 63 8-bit product columns
COLS16 = 2 * NLIMBS + 1  # 33 16-bit columns for the reduction


def _split8(a16: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] uint32 16-bit digits -> [..., 32] f32 8-bit digits
    (little-endian interleave)."""
    lo = (a16 & 0xFF).astype(jnp.float32)
    hi = ((a16 >> 8) & 0xFF).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=-1).reshape(a16.shape[:-1] + (D8,))


def _bands_from_mont_ints(mont_consts: list[int]) -> np.ndarray:
    """[G, 32, 63] f32 banded matrices (W[g, i, i+j] = c8[g, j]) from
    Montgomery-form constants, vectorized over G (a per-matrix Python
    loop cost minutes for an NTT stage's 2^15 twiddles)."""
    buf = b"".join(int(c).to_bytes(D8, "little") for c in mont_consts)
    c8 = np.frombuffer(buf, np.uint8).reshape(-1, D8).astype(np.float32)
    G = c8.shape[0]
    W = np.zeros((G, D8, COLS8), np.float32)
    for i in range(D8):
        W[:, i, i:i + D8] = c8
    return W


def band_matrix(c_mont: int) -> np.ndarray:
    """[32, 63] f32 banded matrix of a constant's Montgomery-form 8-bit
    digits: W[i, i+j] = c8[j]."""
    return _bands_from_mont_ints([c_mont])[0]


def band_matrices(df: DeviceField, consts: list[int]) -> np.ndarray:
    """[G, 32, 63] f32 band matrices for plain-int constants (converted
    to Montgomery form here)."""
    p = df.spec.modulus
    R = (1 << 256) % p
    return _bands_from_mont_ints([c * R % p for c in consts])


def _cols8_to_cols16(p8: jnp.ndarray) -> jnp.ndarray:
    """[..., 63] f32 8-bit-weight columns (<= 2^22, exact) -> [..., 33]
    uint32 16-bit-weight columns <= ~2^18, the _mont_reduce_cols input
    contract. Per-column byte spread keeps every intermediate small."""
    pi = p8.astype(jnp.int32)
    b0 = pi & 0xFF
    b1 = (pi >> 8) & 0xFF
    b2 = pi >> 16
    z = jnp.zeros_like(b0[..., :1])
    # D[k] = b0[k] + b1[k-1] + b2[k-2], positions 0..64
    d = (jnp.concatenate([b0, z, z], axis=-1)
         + jnp.concatenate([z, b1, z], axis=-1)
         + jnp.concatenate([z, z, b2], axis=-1))          # [..., 65]
    d = d.astype(U32)
    even = d[..., 0::2]                                    # 33 entries
    odd = d[..., 1::2]                                     # 32 entries
    zpad = jnp.zeros_like(even[..., :1])
    odd = jnp.concatenate([odd, zpad], axis=-1)
    return even + (odd << 8)                               # <= ~2^18


def mul_const_grouped(df: DeviceField, x: jnp.ndarray,
                      W: jnp.ndarray) -> jnp.ndarray:
    """x [G, nb, 16] Montgomery × per-group constants W [G, 32, 63]
    (from band_matrices) -> [G, nb, 16] Montgomery, bit-identical to
    fmul against the broadcast constants."""
    a8 = _split8(x)                                        # [G, nb, 32]
    p8 = jax.lax.dot_general(
        a8, W, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [G, nb, 63]
    cols = _cols8_to_cols16(p8)                            # [G, nb, 33]
    return _mont_reduce_cols(df, cols)


# ---------------------------------------------------------------------------
# NTT with MXU twiddle multiplies
# ---------------------------------------------------------------------------
#
# Single-device four-step decomposition n = R*C (both ~sqrt(n)):
#   B[k_r, c]   = size-R NTT along axis 0 (root ω^C)
#   Bt[k_r, c]  = B * ω^{k_r·c}          (pairwise — ONE VPU fmul pass)
#   E[k_c, k_r] = size-C NTT of Bt^T along axis 0 (root ω^R)
#   out[k_r + R·k_c] = E[k_c, k_r]       (row-major flatten of E)
# Every stage of both axis-NTTs multiplies a twiddle shared across ALL
# of the other axis, so each grouped matmul has >= sqrt(n) lanes per
# group and the band tensors total ~(R+C)·8 KB — the memory and
# lane-starvation problems of banded radix-2 late stages disappear.

_MXU4_CACHE: dict = {}


class _Mxu4Plan:
    def __init__(self, df: DeviceField, n: int, omega: int):
        from .ntt import make_plan, bit_reverse_perm
        p = df.spec.modulus
        k = n.bit_length() - 1
        self.n = n
        self.R = 1 << ((k + 1) // 2)
        self.C = n // self.R
        Rr, Cc = self.R, self.C
        RR = (1 << 256) % p
        self.col_plan = make_plan(df, Rr, pow(omega, Cc, p))
        self.row_plan = make_plan(df, Cc, pow(omega, Rr, p))

        def stage_bands(plan):
            return [jnp.asarray(_bands_from_mont_ints(
                [w * RR % p for w in ws]))
                for ws in plan.twiddle_exps]

        self.col_bands = stage_bands(self.col_plan)
        self.row_bands = stage_bands(self.row_plan)
        self.col_perm = jnp.asarray(bit_reverse_perm(Rr))
        self.row_perm = jnp.asarray(bit_reverse_perm(Cc))
        # diagonal twiddles T[k_r, c] = ω^{k_r·c}, mont digits [n, 16]
        buf = bytearray(32 * n)
        wr = 1  # ω^{k_r}
        for kr in range(Rr):
            t = RR  # mont(1) running product T · R
            step = wr * RR % p
            base = kr * Cc
            for c in range(Cc):
                buf[32 * (base + c):32 * (base + c + 1)] = \
                    t.to_bytes(32, "little")
                t = t * wr % p
            wr = wr * omega % p
        a16 = np.frombuffer(bytes(buf), np.uint16).reshape(n, NLIMBS)
        self.diag = jnp.asarray(a16.astype(np.uint32))


def _mxu4_plan(df: DeviceField, plan) -> _Mxu4Plan:
    key = (id(df), id(plan))
    ent = _MXU4_CACHE.get(key)
    if ent is None or ent[0] is not plan:
        ent = (plan, _Mxu4Plan(df, plan.n, plan.omega))
        _MXU4_CACHE[key] = ent
    return ent[1]


def _axis0_ntt_mxu(df: DeviceField, x: jnp.ndarray, perm, bands,
                   N: int, L: int) -> jnp.ndarray:
    """Size-N NTT along axis 0 of [N, L, 16]; twiddle multiplies as
    grouped MXU matmuls with (N/m)*L lanes per twiddle group."""
    from ..fields.device import fadd, fsub
    x = x[perm]
    for s, W in enumerate(bands, start=1):
        m = 1 << s
        half = m // 2
        xr = x.reshape(N // m, m, L, NLIMBS)
        lo, hi = xr[:, :half], xr[:, half:]
        hi_g = jnp.swapaxes(hi, 0, 1).reshape(half, (N // m) * L, NLIMBS)
        t = mul_const_grouped(df, hi_g, W)
        t = jnp.swapaxes(t.reshape(half, N // m, L, NLIMBS), 0, 1)
        x = jnp.concatenate([fadd(df, lo, t), fsub(df, lo, t)],
                            axis=1).reshape(N, L, NLIMBS)
    return x


_NTT_MXU_JIT: dict = {}


def ntt_mxu(df: DeviceField, a: jnp.ndarray, plan) -> jnp.ndarray:
    """Forward NTT [n, 16] via the four-step decomposition with MXU
    twiddle matmuls. Bit-identical to ops.ntt.ntt (exact arithmetic,
    same mathematical values)."""
    from ..fields.device import fmul
    p4 = _mxu4_plan(df, plan)
    n, R, C = p4.n, p4.R, p4.C
    key = (id(df), n)
    fn = _NTT_MXU_JIT.get(key)
    if fn is None:
        ncb = len(p4.col_bands)

        def impl(x, cperm, rperm, diag, *bds):
            cbands, rbands = bds[:ncb], bds[ncb:]
            A = x.reshape(R, C, NLIMBS)
            B = _axis0_ntt_mxu(df, A, cperm, cbands, R, C)
            Bt = fmul(df, B.reshape(n, NLIMBS), diag)
            D = jnp.swapaxes(Bt.reshape(R, C, NLIMBS), 0, 1)  # [C, R]
            E = _axis0_ntt_mxu(df, D, rperm, rbands, C, R)
            return E.reshape(n, NLIMBS)
        fn = jax.jit(impl)
        _NTT_MXU_JIT[key] = fn
    return fn(a, p4.col_perm, p4.row_perm, p4.diag,
              *p4.col_bands, *p4.row_bands)


def ntt_mxu_b(df: DeviceField, x: jnp.ndarray, plan) -> jnp.ndarray:
    """Batched forward NTT [m, n, 16] along axis 1, four-step with MXU
    twiddle matmuls (the m polys just widen every matmul's lane axis)."""
    from ..fields.device import fmul
    p4 = _mxu4_plan(df, plan)
    n, R, C = p4.n, p4.R, p4.C
    m = x.shape[0]
    key = (id(df), n, "b", m)
    fn = _NTT_MXU_JIT.get(key)
    if fn is None:
        ncb = len(p4.col_bands)

        def impl(x, cperm, rperm, diag, *bds):
            cbands, rbands = bds[:ncb], bds[ncb:]
            # [m, R, C] -> R leading: [R, m, C] so the axis-0 helper's
            # lane axis carries m*C
            A = jnp.moveaxis(x.reshape(m, R, C, NLIMBS), 1, 0)
            A = A.reshape(R, m * C, NLIMBS)
            B = _axis0_ntt_mxu(df, A, cperm, cbands, R, m * C)
            B = jnp.moveaxis(B.reshape(R, m, C, NLIMBS), 0, 1)  # [m,R,C]
            Bt = fmul(df, B.reshape(m, n, NLIMBS), diag[None])
            D = jnp.swapaxes(Bt.reshape(m, R, C, NLIMBS), 1, 2)  # [m,C,R]
            D = jnp.moveaxis(D, 1, 0).reshape(C, m * R, NLIMBS)
            E = _axis0_ntt_mxu(df, D, rperm, rbands, C, m * R)
            E = jnp.moveaxis(E.reshape(C, m, R, NLIMBS), 0, 1)
            return E.reshape(m, n, NLIMBS)
        fn = jax.jit(impl)
        _NTT_MXU_JIT[key] = fn
    return fn(x, p4.col_perm, p4.row_perm, p4.diag,
              *p4.col_bands, *p4.row_bands)
