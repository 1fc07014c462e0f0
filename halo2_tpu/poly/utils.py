"""Device polynomial utilities: powers, Horner evaluation, inner product,
Kate division — all reformulated as log-depth scans (the reference's serial
recurrences, halo2_proofs/src/arithmetic.rs:298-341, are the patterns TPU
cannot run as written; SURVEY.md §2.5.6)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, fadd, fsub, fmul, finv,
                             fselect, running_sum)


_POWERS_CACHE: dict = {}  # (modulus, x, n) -> device array; domain
# omega/delta power tables recur across keygen + every proof.


def powers(df: DeviceField, x_mont: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^{n-1}] as [n, 16] mont, via inclusive scan.

    Concrete (non-traced) inputs take a host bigint recurrence instead:
    eager callers (keygen σ tables, prover b-vector setup) hit this with
    a known scalar, where tracing + compiling the scan graph costs tens
    of seconds against milliseconds of host math. Inside jit the scan
    path is traced into the caller's graph as before."""
    if n == 1:
        return df.ones((1,))
    if not isinstance(x_mont, jax.core.Tracer):
        import numpy as np
        p = df.spec.modulus
        rinv = pow(1 << 256, -1, p)
        x = int.from_bytes(
            np.asarray(x_mont).astype(np.uint16).tobytes(), "little"
        ) * rinv % p
        key = (p, x, n)
        hit = _POWERS_CACHE.get(key)
        if hit is not None:
            return hit
        buf = bytearray(32 * n)
        acc = (1 << 256) % p  # Montgomery 1; recurrence stays in mont form
        for i in range(n):
            buf[32 * i:32 * (i + 1)] = acc.to_bytes(32, "little")
            acc = acc * x % p
        limbs = np.frombuffer(bytes(buf), dtype=np.uint16).reshape(n, 16)
        out = jnp.asarray(limbs.astype(np.uint32))
        if len(_POWERS_CACHE) >= 16:
            _POWERS_CACHE.pop(next(iter(_POWERS_CACHE)))
        _POWERS_CACHE[key] = out
        return out
    from ..fields.device import running_product
    xs = jnp.broadcast_to(x_mont, (n, NLIMBS))
    xs = jnp.concatenate([df.ones((1,)), xs[1:]], axis=0)
    return running_product(df, xs, axis=0)


def tree_add(df: DeviceField, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Log-depth field sum along axis; returns the reduced array with that
    axis removed."""
    n = a.shape[axis]
    cur = a
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(cur, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(cur, half, 2 * half, axis=axis)
        s = fadd(df, lo, hi)
        if n % 2 == 1:
            rem = jax.lax.slice_in_dim(cur, 2 * half, n, axis=axis)
            s = jnp.concatenate([s, rem], axis=axis)
            n = half + 1
        else:
            n = half
        cur = s
    return jax.lax.index_in_dim(cur, 0, axis=axis, keepdims=False)


def eval_poly(df: DeviceField, coeffs: jnp.ndarray, x_mont: jnp.ndarray
              ) -> jnp.ndarray:
    """p(x) = sum coeffs[i] x^i. Replaces serial Horner
    (arithmetic.rs:298-303) with powers-scan + log-depth dot."""
    n = coeffs.shape[0]
    pw = powers(df, x_mont, n)
    return tree_add(df, fmul(df, coeffs, pw), axis=0)


def inner_product(df: DeviceField, a: jnp.ndarray, b: jnp.ndarray
                  ) -> jnp.ndarray:
    """sum a_i * b_i (arithmetic.rs:308-318)."""
    return tree_add(df, fmul(df, a, b), axis=0)


def batch_eval_polys(df: DeviceField, pairs) -> list[int]:
    """Evaluate many (poly_mont (n, L), point_int) pairs in ONE vmapped
    device dispatch + readback. The prover's eval phases issue dozens of
    scalar opens between the x and x1 squeezes; dispatching each alone
    is pure round-trip latency on a tunneled device."""
    import numpy as np
    if not pairs:
        return []
    n = max(p.shape[0] for p, _ in pairs)
    polys = jnp.stack([
        p if p.shape[0] == n else jnp.concatenate(
            [p, jnp.zeros((n - p.shape[0],) + p.shape[1:], p.dtype)])
        for p, _ in pairs])
    # Powers tables host-built once per DISTINCT point (they hit the
    # concrete fast path in powers()), then indexed on device — this
    # replaces a vmapped Horner scan whose graph was compile-bound and
    # keeps device work to one already-compiled fmul + tree_add.
    uniq = list(dict.fromkeys(pt for _, pt in pairs))
    pw_stack = jnp.stack([powers(df, df.scalar(pt), n) for pt in uniq])
    lookup = {pt: i for i, pt in enumerate(uniq)}
    gidx = jnp.asarray([lookup[pt] for _, pt in pairs], dtype=jnp.int32)
    vals = tree_add(df, fmul(df, polys, pw_stack[gidx]), axis=1)
    return [int(v) for v in df.from_mont_np(np.asarray(vals))]


class MemoEval:
    """Memoized eval function backed by one batch_eval_polys dispatch:
    collect every (poly, point) pair up front, compute once, then serve
    `ev(poly, point)` lookups during the transcript-write phase."""

    def __init__(self, df):
        self.df = df
        self._pairs = []
        self._keys = {}
        self._vals = None

    def collect(self, poly, point: int) -> None:
        key = (id(poly), point)
        if key not in self._keys:
            self._keys[key] = len(self._pairs)
            self._pairs.append((poly, point))

    def compute(self) -> None:
        self._vals = batch_eval_polys(self.df, self._pairs)

    def ev(self, poly, point: int) -> int:
        key = (id(poly), point)
        if self._vals is None or key not in self._keys:
            # fallback: single dispatch (keeps callers correct if a pair
            # was not pre-collected)
            import numpy as np
            return int(self.df.from_mont_np(np.asarray(
                eval_poly(self.df, poly, self.df.scalar(point)))))
        return self._vals[self._keys[key]]


def kate_division(df: DeviceField, coeffs: jnp.ndarray, b_mont: jnp.ndarray
                  ) -> jnp.ndarray:
    """q(X) = (p(X) - p(b)) / (X - b), dropping the remainder: the quotient
    coefficients are q_i = sum_{j>i} a_j b^{j-i-1}.

    Replaces the serial backward recurrence (arithmetic.rs:322-341) with:
    powers scan, suffix-sum scan, inverse-powers rescale — exact field
    arithmetic throughout. Requires b != 0 (true for Fiat–Shamir points
    with overwhelming probability; asserted by the caller)."""
    n = coeffs.shape[0]
    pw = powers(df, b_mont, n)                      # b^j
    u = fmul(df, coeffs, pw)                        # a_j b^j
    suf = running_sum(df, u, axis=0, reverse=True)
    # T_i = sum_{j >= i+1} a_j b^j  (shift the inclusive suffix left by one)
    t = jnp.concatenate([suf[1:], df.zeros((1,))], axis=0)
    binv = finv(df, b_mont)
    ipw = powers(df, binv, n)                       # b^-i
    ipw1 = fmul(df, ipw, jnp.broadcast_to(binv, (n, NLIMBS)))  # b^-(i+1)
    q = fmul(df, t, ipw1)
    # The quotient has degree n-2, so q[n-1] == 0 by construction. We
    # KEEP the length-n shape (instead of truncating) so chained Kate
    # divisions reuse one compiled scan shape rather than compiling a
    # fresh graph per length (multiopen resizes to n afterwards anyway,
    # multiopen/prover.rs:79-88).
    return q


def distribute_powers(df: DeviceField, arrays, base_mont: jnp.ndarray):
    """Horner-fold arrays with `base`: acc = acc * base + term, i.e.
    sum_i base^{m-1-i} * arrays[i] — exactly Ast::DistributePowers
    (poly/evaluator.rs:186-196) and the verifier's expected_h_eval fold."""
    acc = arrays[0]
    for arr in arrays[1:]:
        acc = fadd(df, fmul(df, acc, jnp.broadcast_to(base_mont, acc.shape)),
                   arr)
    return acc
