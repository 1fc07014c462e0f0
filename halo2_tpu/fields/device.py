"""Device (JAX/TPU) prime-field arithmetic over 16x16-bit limb arrays.

A field element is a uint32 array of shape [..., 16]: little-endian 16-bit
digits, each stored in a uint32 lane, value held in **Montgomery form**
(R = 2^256). 16-bit digits are the TPU-native choice: a 16x16 product fits
exactly in a uint32 VPU lane, and column sums of up to 32 partial products
stay below 2^22, so no 64-bit arithmetic is ever needed.

All functions are pure, jit-friendly and vectorized over arbitrary leading
axes. Internally limbs are unstacked into Python lists of [...]-shaped
arrays so XLA sees straight-line elementwise code (no gathers).

Reference behavior reproduced: pasta_curves field ops (the computational
substrate of halo2_proofs; re-exported at halo2_proofs/src/arithmetic.rs:10).
The reduction is textbook word-by-word Montgomery (CIOS), independently
derived for 16-bit digits.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from .host import FieldSpec, FP, FQ

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
R = 1 << (NLIMBS * LIMB_BITS)  # Montgomery radix 2^256

U32 = jnp.uint32

_UPLOAD_JIT: dict = {}  # DeviceField id -> jitted widen+to-mont upload fn


def int_to_limbs(v: int) -> np.ndarray:
    """Python int -> uint32[16] little-endian 16-bit digits (numpy, host)."""
    return np.array([(v >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)],
                    dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    a = np.asarray(limbs, dtype=np.uint64)
    return sum(int(a[..., i]) << (LIMB_BITS * i) for i in range(NLIMBS))


@dataclass(frozen=True)
class DeviceField:
    """Static per-field constants for device kernels. Hashable so it can be
    closed over by jitted functions."""

    spec: FieldSpec

    @functools.cached_property
    def p_limbs(self) -> tuple[int, ...]:
        return tuple(int(x) for x in int_to_limbs(self.spec.modulus))

    @functools.cached_property
    def n0(self) -> int:
        # -p^{-1} mod 2^16 (Montgomery constant for 16-bit digits)
        return (-pow(self.spec.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return R % self.spec.modulus

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return R * R % self.spec.modulus

    # ---------- host <-> device conversion ----------
    def to_mont_np(self, values) -> np.ndarray:
        """Python ints (nested list / 1-d array of int objects) -> uint32
        [..., 16] Montgomery-form numpy array. Host-side packing via one
        bytes buffer (+ native Montgomery conversion when available) —
        the per-element int_to_limbs path cost ~3 us/element, which
        dominated EvaluationDomain construction at bench sizes."""
        arr = np.asarray(values, dtype=object)
        p = self.spec.modulus
        flat = arr.reshape(-1)
        from ..curves import native
        idx = (None if os.environ.get("HALO2_TPU_NO_NATIVE")
               else native.field_idx(self.spec))
        if idx is not None:
            raw = native.ints_to_limbs([int(v) % p for v in flat]).copy()
            native.raw_to_mont_inplace(idx, raw, p)
            out = raw.view(np.uint16).astype(np.uint32).reshape(
                flat.shape[0], NLIMBS)
        else:
            buf = b"".join(
                ((int(v) % p) * R % p).to_bytes(32, "little") for v in flat)
            out = (np.frombuffer(buf, np.uint16)
                   .astype(np.uint32).reshape(flat.shape[0], NLIMBS))
        return out.reshape(arr.shape + (NLIMBS,))

    def from_mont_np(self, limbs) -> np.ndarray:
        """uint32 [..., 16] Montgomery-form -> object array of Python ints.
        Native fast path: one C Montgomery reduction pass + bytes slicing
        instead of per-element 16-limb recombination."""
        a = np.asarray(limbs)
        p = self.spec.modulus
        flat = a.reshape(-1, NLIMBS)
        from ..curves import native
        idx = (None if os.environ.get("HALO2_TPU_NO_NATIVE")
               else native.field_idx(self.spec))
        out = np.empty((flat.shape[0],), dtype=object)
        if idx is not None and flat.shape[0]:
            u64 = (np.ascontiguousarray(flat.astype(np.uint16))
                   .view(np.uint64).reshape(-1, 4).copy())
            one = pow(2, 256, p)
            # data[i] = fmul(data[i], 1) = data[i] * R^-1  (mont -> raw)
            native.powmul_inplace(idx, u64, one, 1, 1)
            buf = u64.tobytes()
            for i in range(flat.shape[0]):
                out[i] = int.from_bytes(buf[32 * i:32 * i + 32], "little")
            return out.reshape(a.shape[:-1])
        rinv = pow(R, -1, p)
        for i in range(flat.shape[0]):
            out[i] = limbs_to_int(flat[i]) * rinv % p
        return out.reshape(a.shape[:-1])

    def from_mont_u64(self, limbs) -> np.ndarray:
        """uint32 [..., 16] Montgomery-form -> canonical (n, 4) uint64 LE
        limb array (native-library layout). Vectorized sibling of
        from_mont_np for callers that sort/compare rather than need
        Python ints."""
        a = np.asarray(limbs)
        p = self.spec.modulus
        flat = a.reshape(-1, NLIMBS)
        from ..curves import native
        idx = (None if os.environ.get("HALO2_TPU_NO_NATIVE")
               else native.field_idx(self.spec))
        if idx is not None and flat.shape[0]:
            u64 = (np.ascontiguousarray(flat.astype(np.uint16))
                   .view(np.uint64).reshape(-1, 4).copy())
            one = pow(2, 256, p)
            native.powmul_inplace(idx, u64, one, 1, 1)
            return u64
        ints = self.from_mont_np(flat)
        buf = b"".join(int(v).to_bytes(32, "little") for v in ints)
        return np.frombuffer(buf, np.uint64).reshape(-1, 4).copy()

    def upload_canonical_u64(self, raw_u64: np.ndarray) -> jnp.ndarray:
        """Canonical (n, 4) uint64 LE limbs -> [n, 16] Montgomery device
        array. Native Montgomery conversion on the host when available
        (upload stays in the compact 16-bit wire format); otherwise the
        R^2-multiply runs as part of the upload_values dispatch."""
        from ..curves import native
        idx = (None if os.environ.get("HALO2_TPU_NO_NATIVE")
               else native.field_idx(self.spec))
        if idx is not None:
            mont = np.ascontiguousarray(raw_u64, dtype=np.uint64).copy()
            native.raw_to_mont_inplace(idx, mont, self.spec.modulus)
            return self.upload_mont(mont)
        buf = np.ascontiguousarray(raw_u64, dtype=np.uint64).tobytes()
        vals = [int.from_bytes(buf[32 * i:32 * i + 32], "little")
                for i in range(len(raw_u64))]
        return self.upload_values(vals)

    def scalar(self, v: int) -> jnp.ndarray:
        """Single field element (int, NOT in Montgomery form) -> device."""
        p = self.spec.modulus
        return jnp.asarray(int_to_limbs(v % p * R % p))

    def upload_values(self, values) -> jnp.ndarray:
        """Python ints (canonical) -> [n, 16] Montgomery device array.
        The wire format is packed 16-bit digits (32 B per element, half
        the u32 limb array — the host->device tunnel is the prover's
        bandwidth bottleneck) and the widen + Montgomery conversion is
        one fused on-device dispatch instead of per-element host bigint
        multiplies."""
        p = self.spec.modulus
        buf = b"".join((int(v) % p).to_bytes(32, "little") for v in values)
        a16 = np.frombuffer(buf, np.uint16).reshape(-1, NLIMBS)
        import jax
        fn = _UPLOAD_JIT.get(id(self))
        if fn is None:
            r2 = int_to_limbs(self.r2_mod_p)

            def impl(x16):
                x = x16.astype(U32)
                r2b = jnp.broadcast_to(jnp.asarray(r2), x.shape)
                return fmul(self, x, r2b)

            fn = jax.jit(impl)
            _UPLOAD_JIT[id(self)] = fn
        return fn(jnp.asarray(a16))

    def upload_mont(self, mont_u64: np.ndarray) -> jnp.ndarray:
        """(n, 4) uint64 LE Montgomery limbs (native-library layout) ->
        [n, 16] Montgomery device array. Same 16-bit wire format as
        upload_values but without the R^2 multiply (data is already in
        Montgomery form)."""
        a16 = (np.ascontiguousarray(mont_u64, dtype=np.uint64)
               .view(np.uint16).reshape(-1, NLIMBS))
        import jax
        key = ("mont", id(self))
        fn = _UPLOAD_JIT.get(key)
        if fn is None:
            fn = jax.jit(lambda x16: x16.astype(U32))
            _UPLOAD_JIT[key] = fn
        return fn(jnp.asarray(a16))

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros(tuple(shape) + (NLIMBS,), dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = self.scalar(1)
        return jnp.broadcast_to(one, tuple(shape) + (NLIMBS,))


FP_DEV = DeviceField(FP)
FQ_DEV = DeviceField(FQ)


# ---------------------------------------------------------------------------
# limb-list helpers (operate on python lists of [...]-shaped uint32 arrays)
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[..., i] for i in range(NLIMBS)]


def _stack(limbs):
    return jnp.stack(limbs, axis=-1)


def _add_raw(a, b):
    """16-limb add -> (16 normalized limbs, carry bit)."""
    out = []
    c = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        t = a[i] + b[i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    return out, c


def _sub_raw(a, b):
    """16-limb subtract -> (16 normalized limbs, borrow bit 0/1)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        t = a[i] + jnp.uint32(1 << LIMB_BITS) - b[i] - borrow
        out.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    return out, borrow


def _const_limbs(df: DeviceField, like, limbs_tuple):
    return [jnp.full_like(like, l) for l in limbs_tuple]


def _select(cond, a, b):
    """cond: uint32 0/1 broadcastable; select a where cond else b."""
    c = cond.astype(jnp.bool_)
    return [jnp.where(c, x, y) for x, y in zip(a, b)]


def _rolled() -> bool:
    """Loop-rolled limb kernels (lax.fori_loop/scan over the 16 limbs)
    instead of Python-unrolled straight-line code.

    The unrolled form is right for TPU: XLA:TPU fuses the elementwise
    limb graph and loops carry real per-iteration cost. On CPU the same
    unrolled graph is a compile-time disaster — one Montgomery mul is
    ~3k HLO ops, a Jacobian add ~24 muls, and a jitted MSM ladder body
    ~90k ops that XLA:CPU/LLVM chews on for many minutes (the multichip
    dryrun timeout). Rolled kernels compute the identical values with a
    ~15x smaller graph. Override with HALO2_TPU_ROLLED=0/1."""
    import os
    env = os.environ.get("HALO2_TPU_ROLLED")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


_FIELD_OP_JIT: dict = {}


def _jitted_op(df: DeviceField, name: str, make):
    """Per-(field, op) jitted wrapper. The limb ops expand to 30-500 XLA
    primitives; executed eagerly each one dispatches its own tiny
    executable (the prover spent more time in apply_primitive than in
    math). jax.jit fuses them per input shape and reuses the compiled
    kernel; nested under an outer trace it simply traces through."""
    key = (name, id(df), _rolled())
    fn = _FIELD_OP_JIT.get(key)
    if fn is None:
        fn = jax.jit(make(df))
        _FIELD_OP_JIT[key] = fn
    return fn


# ---- loop-rolled raw ops on stacked [..., 16] arrays (see _rolled) ----

def _add_raw_st(a, b):
    """Stacked 16-limb add via lax.scan -> ([..., 16] digits, carry)."""
    s = jnp.moveaxis(a + b, -1, 0)  # each column < 2^17, exact in u32

    def step(c, col):
        t = col + c
        return t >> LIMB_BITS, t & MASK

    c, digits = jax.lax.scan(step, jnp.zeros_like(s[0]), s)
    return jnp.moveaxis(digits, 0, -1), c


def _sub_raw_st(a, b):
    """Stacked 16-limb subtract -> ([..., 16] digits, borrow 0/1)."""
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        t = ai + jnp.uint32(1 << LIMB_BITS) - bi - borrow
        return jnp.uint32(1) - (t >> LIMB_BITS), t & MASK

    borrow, digits = jax.lax.scan(step, jnp.zeros_like(am[0]), (am, bm))
    return jnp.moveaxis(digits, 0, -1), borrow


def _bcast_p(df: DeviceField, like):
    return jnp.broadcast_to(jnp.asarray(np.array(df.p_limbs, np.uint32)),
                            like.shape)


def fadd(df: DeviceField, a, b):
    return _jitted_op(df, "fadd",
                      lambda d: lambda x, y: _fadd_impl(d, x, y))(a, b)


def _fadd_impl(df: DeviceField, a, b):
    if _rolled():
        s, carry = _add_raw_st(a, b)
        d, borrow = _sub_raw_st(s, _bcast_p(df, s))
        use_d = carry | (jnp.uint32(1) - borrow)
        return jnp.where(use_d.astype(jnp.bool_)[..., None], d, s)
    al, bl = _unstack(a), _unstack(b)
    s, carry = _add_raw(al, bl)
    pl = _const_limbs(df, s[0], df.p_limbs)
    d, borrow = _sub_raw(s, pl)
    use_d = carry | (jnp.uint32(1) - borrow)
    return _stack(_select(use_d, d, s))


def fsub(df: DeviceField, a, b):
    return _jitted_op(df, "fsub",
                      lambda d: lambda x, y: _fsub_impl(d, x, y))(a, b)


def _fsub_impl(df: DeviceField, a, b):
    if _rolled():
        d, borrow = _sub_raw_st(a, b)
        dp, _ = _add_raw_st(d, _bcast_p(df, d))
        return jnp.where(borrow.astype(jnp.bool_)[..., None], dp, d)
    al, bl = _unstack(a), _unstack(b)
    d, borrow = _sub_raw(al, bl)
    pl = _const_limbs(df, d[0], df.p_limbs)
    dp, _ = _add_raw(d, pl)
    return _stack(_select(borrow, dp, d))


def fneg(df: DeviceField, a):
    return fsub(df, jnp.zeros_like(a), a)


def _mont_mul(df: DeviceField, a, b):
    """Montgomery product on stacked [..., 16] digit arrays: returns
    a*b*R^{-1} mod p, fully reduced. Formulated as a FLAT elementwise
    dataflow over per-limb [...] arrays (no [..., 16, 16] outer-product
    tensor, no dynamic-update-slice column array): every value is a
    fusion-resident [...] vector, so XLA emits one (or a few) fused
    kernels instead of materializing a [..., 33] accumulator between 32
    sequential slice-updates — the dominant HBM traffic of the old
    form (each .at[].add re-wrote the whole column array)."""
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    if a.shape[:-1] != batch:
        a = jnp.broadcast_to(a, batch + (NLIMBS,))
    if b.shape[:-1] != batch:
        b = jnp.broadcast_to(b, batch + (NLIMBS,))
    al = _unstack(a)
    bl = _unstack(b)
    zero = jnp.zeros(batch, dtype=U32)
    cols = [zero] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            prod = al[i] * bl[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    return _mont_reduce_cols(df, cols)


def _mont_reduce_cols(df: DeviceField, cols) -> jnp.ndarray:
    """Steps 3-5 of the Montgomery product on accumulated columns
    (a [..., 33] tensor or a list of 33 [...] arrays, each <= ~2^22):
    word-by-word reduction that skips the zero limbs of the Pasta
    moduli, carry propagation, conditional subtract. Shared by
    _mont_mul and the MXU constant-multiply path (ops/mxu_field.py).
    List-based like the Pallas kernel (ops/pallas_point._k_mul) so the
    whole reduction is one fused elementwise graph."""
    if not isinstance(cols, (list, tuple)):
        cols = [cols[..., i] for i in range(2 * NLIMBS + 1)]
    else:
        cols = list(cols)
    n0 = jnp.uint32(df.n0)
    p = df.p_limbs
    nz = [j for j in range(1, NLIMBS) if p[j] != 0]
    c = jnp.zeros_like(cols[0])
    for i in range(NLIMBS):
        t = cols[i] + c
        m = (t * n0) & MASK
        mp0 = m * jnp.uint32(p[0])
        u = t + (mp0 & MASK)
        c = (u >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        for j in nz:
            prod = m * jnp.uint32(p[j])
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    # 4) carry-propagate the high half.
    out = []
    for i in range(NLIMBS):
        t = cols[NLIMBS + i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    # 5) result < 2p: one conditional subtraction.
    pl = _const_limbs(df, out[0], p)
    d, borrow = _sub_raw(out, pl)
    return _stack(_select(c | (jnp.uint32(1) - borrow), d, out))


def _mont_mul_rolled(df: DeviceField, a, b):
    """Identical math to _mont_mul with the two 16-round limb loops as
    lax.fori_loop — ~15x fewer HLO ops per multiply, which is what keeps
    XLA:CPU compiles of mul-heavy loop bodies (MSM ladders, NTT stages)
    tractable. Values are bit-identical to the unrolled form."""
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    if a.shape[:-1] != batch:
        a = jnp.broadcast_to(a, batch + (NLIMBS,))
    if b.shape[:-1] != batch:
        b = jnp.broadcast_to(b, batch + (NLIMBS,))
    prod = a[..., :, None] * b[..., None, :]
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    cols0 = jnp.zeros(batch + (2 * NLIMBS + 1,), dtype=U32)

    def acc_body(i, cols):
        lo_i = jax.lax.dynamic_index_in_dim(lo, i, axis=-2, keepdims=False)
        hi_i = jax.lax.dynamic_index_in_dim(hi, i, axis=-2, keepdims=False)
        seg = jax.lax.dynamic_slice_in_dim(cols, i, NLIMBS, axis=-1)
        cols = jax.lax.dynamic_update_slice_in_dim(cols, seg + lo_i, i,
                                                   axis=-1)
        seg = jax.lax.dynamic_slice_in_dim(cols, i + 1, NLIMBS, axis=-1)
        cols = jax.lax.dynamic_update_slice_in_dim(cols, seg + hi_i, i + 1,
                                                   axis=-1)
        return cols

    cols = jax.lax.fori_loop(0, NLIMBS, acc_body, cols0)

    n0 = jnp.uint32(df.n0)
    p = df.p_limbs
    nz = [j for j in range(1, NLIMBS) if p[j] != 0]
    runs = []
    for j in nz:
        if runs and runs[-1][1] == j:
            runs[-1] = (runs[-1][0], j + 1)
        else:
            runs.append((j, j + 1))
    run_consts = [jnp.asarray(np.array([p[j] for j in range(lo_j, hi_j)],
                                       dtype=np.uint32))
                  for lo_j, hi_j in runs]

    def red_body(i, state):
        cols, c = state
        t = jax.lax.dynamic_index_in_dim(cols, i, axis=-1,
                                         keepdims=False) + c
        m = (t * n0) & MASK
        mp0 = m * jnp.uint32(p[0])
        u = t + (mp0 & MASK)
        c = (u >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        for (lo_j, hi_j), pc in zip(runs, run_consts):
            ln = hi_j - lo_j
            mp = m[..., None] * pc
            seg = jax.lax.dynamic_slice_in_dim(cols, i + lo_j, ln, axis=-1)
            cols = jax.lax.dynamic_update_slice_in_dim(
                cols, seg + (mp & MASK), i + lo_j, axis=-1)
            seg = jax.lax.dynamic_slice_in_dim(cols, i + lo_j + 1, ln,
                                               axis=-1)
            cols = jax.lax.dynamic_update_slice_in_dim(
                cols, seg + (mp >> LIMB_BITS), i + lo_j + 1, axis=-1)
        return cols, c

    cols, c = jax.lax.fori_loop(0, NLIMBS, red_body,
                                (cols, jnp.zeros(batch, dtype=U32)))

    # carry-propagate the high half via scan
    high = jnp.moveaxis(cols[..., NLIMBS:2 * NLIMBS], -1, 0)

    def carry_step(cc, col):
        t = col + cc
        return t >> LIMB_BITS, t & MASK

    c, digits = jax.lax.scan(carry_step, c, high)
    out = jnp.moveaxis(digits, 0, -1)
    d, borrow = _sub_raw_st(out, _bcast_p(df, out))
    use_d = c | (jnp.uint32(1) - borrow)
    return jnp.where(use_d.astype(jnp.bool_)[..., None], d, out)


def fmul(df: DeviceField, a, b):
    return _jitted_op(
        df, "fmul",
        lambda d: lambda x, y: (_mont_mul_rolled(d, x, y) if _rolled()
                                else _mont_mul(d, x, y)))(a, b)


def fsquare(df: DeviceField, a):
    if _rolled():
        return _mont_mul_rolled(df, a, a)
    return _mont_mul(df, a, a)


def fpow(df: DeviceField, a, exponent: int):
    """a^e for a *static* integer exponent, via fori_loop square-&-multiply
    over the exponent bits (MSB first). O(255) sequential rounds, each a
    vectorized Montgomery mul — traced once."""
    if exponent == 0:
        return df.ones(a.shape[:-1])
    bits = [int(b) for b in bin(exponent)[2:]]
    bits_arr = jnp.asarray(bits, dtype=jnp.uint32)

    def body(i, acc):
        acc = fsquare(df, acc)
        mul = fmul(df, acc, a)
        return jnp.where(bits_arr[i] == 1, mul, acc)

    # the leading bit is always 1: start from a
    return jax.lax.fori_loop(1, len(bits), body, a)


def finv(df: DeviceField, a):
    """Fermat inversion a^(p-2); 0 -> 0.

    Concrete SCALAR inputs (a single [16] element outside any trace —
    IPA b-vector bases, Kate divisors, domain constants) go through host
    pow(): the eager 255-round device ladder costs seconds of dispatch
    for one element that python computes in microseconds. Traced or
    batched inputs keep the device ladder."""
    if a.shape == (NLIMBS,) and not isinstance(a, jax.core.Tracer):
        import numpy as np
        p = df.spec.modulus
        # mont(x)=xR; (xR)^-1 * R^2 = x^-1 R = mont(x^-1)
        m = int.from_bytes(np.asarray(a).astype(np.uint16).tobytes(),
                           "little")
        if m == 0:
            return jnp.zeros((NLIMBS,), dtype=U32)
        inv = pow(m, -1, p) * pow(1 << 256, 2, p) % p
        return jnp.asarray(int_to_limbs(inv))
    return fpow(df, a, df.spec.modulus - 2)


def is_zero(df: DeviceField, a):
    """Boolean [...] mask. Valid on fully-reduced representations (all ops
    here produce canonical Montgomery form)."""
    return jnp.all(a == 0, axis=-1)


def feq(df: DeviceField, a, b):
    return jnp.all(a == b, axis=-1)


def fselect(cond, a, b):
    """cond: bool [...]; elementwise select of field arrays [..., 16]."""
    return jnp.where(cond[..., None], a, b)


_SCAN_JIT: dict = {}


def _scan_hs(df: DeviceField, a, axis: int, reverse: bool,
             is_mul: bool):
    """Hillis-Steele inclusive scan as a fori_loop over log2(n) rounds
    of ONE shift+combine body (shift distance and mask computed
    in-graph from the loop index).

    Replaces lax.associative_scan, which unrolls its log-depth levels
    into the trace — each level inlines the full Montgomery-mul code,
    ~15 MB of executable at n=2^17. On the tunneled runtime executable
    bytes are the fresh-process cost (~1.4 MB/s first-call transfer),
    so the n·log n work of Hillis-Steele (~17 extra wide muls, tens of
    ms) buys back tens of seconds of first-use load per program that
    embeds a scan."""
    n = a.shape[axis]
    if n <= 1:
        return a
    x = jnp.moveaxis(a, axis, 0) if axis != 0 else a
    if reverse:
        x = jnp.flip(x, axis=0)
    idx = jnp.arange(n, dtype=jnp.int32)
    ok_shape = (n,) + (1,) * (x.ndim - 1)

    def body(i, x):
        d = jnp.int32(1) << i
        shifted = jnp.roll(x, d, axis=0)
        comb = (fmul(df, x, shifted) if is_mul
                else fadd(df, x, shifted))
        return jnp.where((idx >= d).reshape(ok_shape), comb, x)

    x = jax.lax.fori_loop(0, (n - 1).bit_length(), body, x)
    if reverse:
        x = jnp.flip(x, axis=0)
    return jnp.moveaxis(x, 0, axis) if axis != 0 else x


def running_product(df: DeviceField, a, axis: int = 0,
                    reverse: bool = False):
    """Inclusive product scan (grand products; permutation/lookup z).
    Jit-cached per (field, axis, reverse) so eager prover calls reuse
    one traced graph per shape."""
    key = ("prod", id(df), axis, reverse)
    fn = _SCAN_JIT.get(key)
    if fn is None:
        fn = jax.jit(lambda x: _scan_hs(df, x, axis, reverse, True))
        _SCAN_JIT[key] = fn
    return fn(a)


def running_sum(df: DeviceField, a, axis: int = 0, reverse: bool = False):
    """Inclusive sum scan (Kate-division suffix sums), jit-cached like
    running_product."""
    key = ("sum", id(df), axis, reverse)
    fn = _SCAN_JIT.get(key)
    if fn is None:
        fn = jax.jit(lambda x: _scan_hs(df, x, axis, reverse, False))
        _SCAN_JIT[key] = fn
    return fn(a)


def batch_inv(df: DeviceField, a, axis: int = 0):
    """Batched inversion along `axis` via prefix/suffix product scans plus a
    single Fermat inversion. Zeros map to zero. The scans are jit-cached
    (running_product); the Fermat pow stays eager — one element, and
    inlining its 255-squaring graph into a jitted module is too large
    for a single XLA:CPU compile.

    Replaces the serial Montgomery-trick loop of ff::BatchInvert (used by
    batch_invert_assigned, halo2_proofs/src/poly.rs:135-162) with two
    log-depth associative scans — the TPU-native formulation.
    """
    zero_mask = is_zero(df, a)
    ones = jnp.broadcast_to(df.scalar(1), a.shape)
    clean = fselect(zero_mask, ones, a)

    prefix_inc = running_product(df, clean, axis=axis)
    suffix_inc = running_product(df, clean, axis=axis, reverse=True)
    # exclusive versions via shift
    def shift(x, rev):
        pad = jnp.broadcast_to(df.scalar(1), x.shape)
        idx = [slice(None)] * x.ndim
        if rev:
            idx[axis] = slice(1, None)
            body = x[tuple(idx)]
            idxp = [slice(None)] * x.ndim
            idxp[axis] = slice(0, 1)
            return jnp.concatenate([body, pad[tuple(idxp)]], axis=axis)
        idx[axis] = slice(0, -1)
        body = x[tuple(idx)]
        idxp = [slice(None)] * x.ndim
        idxp[axis] = slice(0, 1)
        return jnp.concatenate([pad[tuple(idxp)], body], axis=axis)

    prefix_exc = shift(prefix_inc, rev=False)
    suffix_exc = shift(suffix_inc, rev=True)

    # total product = last of prefix_inc
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(-1, None)
    total = prefix_inc[tuple(idx)]
    total_inv = finv(df, total)

    out = fmul(df, fmul(df, prefix_exc, suffix_exc),
               jnp.broadcast_to(total_inv, a.shape))
    return fselect(zero_mask, jnp.zeros_like(a), out)


def to_mont(df: DeviceField, a_canonical):
    """Canonical-digit array [...,16] -> Montgomery form (mul by R^2)."""
    r2 = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(df.r2_mod_p)), a_canonical.shape)
    return fmul(df, a_canonical, r2)


def from_mont(df: DeviceField, a_mont):
    """Montgomery form -> canonical digits (Montgomery mul by 1)."""
    one = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(1)), a_mont.shape)
    return fmul(df, a_mont, one)
