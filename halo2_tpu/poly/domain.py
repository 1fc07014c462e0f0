"""EvaluationDomain: 2^k base domain + zeta-coset extended domain.

Faithful port of the math of halo2_proofs/src/poly/domain.rs:19-498 with
device-resident tables: twiddle plans for both domain sizes, the zeta-power
coset pattern, and the inverted vanishing evaluations t(ζ·ω_ext^i)^{-1}
(only 2^(extended_k - k) distinct values, tiled — domain.rs:88-111).
All heavy transforms (lagrange_to_coeff, coeff_to_extended,
extended_to_coeff, divide_by_vanishing_poly) are single jit-friendly device
programs built on the NTT kernels.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..fields.host import FieldSpec
from ..fields.device import DeviceField, NLIMBS, fmul
from ..ops.ntt import NttPlan, make_plan, ntt, int_to_limbs
from .polynomial import Rotation


import os as _os

# Opt-in size threshold for the Pallas limbs-first butterfly kernel
# (ops/pallas_field.ntt_pallas). Disabled by default: measured on the
# attached v5e chip the Pallas path runs ~0.7M butterflies/s at k=20
# vs ~46M for the fused-XLA butterflies (the kernel's HBM access
# pattern defeats the DMA pipeline) — set HALO2_TPU_PALLAS_NTT_MIN to
# a size to experiment.
PALLAS_NTT_MIN = int(_os.environ.get("HALO2_TPU_PALLAS_NTT_MIN",
                                     str(1 << 62)))


def _use_pallas(n: int) -> bool:
    if n < PALLAS_NTT_MIN:
        return False
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# At or above this size (on accelerator backends) NTTs run through the
# four-step MXU-matmul path (ops/mxu_field.ntt_mxu): the twiddle digit
# products become grouped matmuls on the systolic array — measured
# 62.2M vs 46.7M butterflies/s at k=20 on the attached v5e (bit-exact;
# the Montgomery reduction stays on the VPU). Below it, dispatch
# latency floors both paths; set huge to disable.
MXU_NTT_MIN = int(_os.environ.get("HALO2_TPU_MXU_NTT_MIN",
                                  str(1 << 16)))


def _use_mxu(n: int) -> bool:
    if n < MXU_NTT_MIN:
        return False
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon", "gpu")
    except Exception:
        return False


def _ntt_dispatch(df: DeviceField, values, plan):
    """ntt(), the MXU four-step path, or the Pallas limbs-first path,
    by size/platform."""
    if _use_mxu(plan.n):
        from ..ops.mxu_field import ntt_mxu
        return ntt_mxu(df, values, plan)
    if _use_pallas(plan.n):
        from ..ops.pallas_field import (ntt_pallas, to_limbs_first,
                                        from_limbs_first)
        return from_limbs_first(ntt_pallas(df, to_limbs_first(values),
                                           plan))
    return ntt(df, values, plan)


# Base-domain sizes at or below this run keygen/interactive transforms in
# the native host library (one OpenMP NTT call instead of a tunneled
# device dispatch); above it the device butterfly kernels take over.
# NOTE: the cap is on the BASE domain size self.n — extended-domain
# transforms (coeff_to_extended / extended_to_coeff) gated by it operate
# on extended_n, up to quotient_poly_degree x larger, so raising this
# knob moves transforms up to that factor bigger onto the host.
# Resolution order: HALO2_TPU_NATIVE_NTT_MAX env > per-box measured
# crossover (scripts/calibrate_ntt.py → .jax_cache/ntt_crossover.json)
# > the 16384 default.
_NATIVE_NTT_DEFAULT = 16384
_CROSSOVER_CACHE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), ".jax_cache", "ntt_crossover.json")


def native_ntt_max() -> int:
    env = _os.environ.get("HALO2_TPU_NATIVE_NTT_MAX")
    if env is not None:
        return int(env)
    global _NATIVE_NTT_MEASURED
    if _NATIVE_NTT_MEASURED is None:
        val = _NATIVE_NTT_DEFAULT
        try:
            import json
            with open(_CROSSOVER_CACHE) as f:
                data = json.load(f)
            import jax
            key = jax.default_backend()
            if key in data:
                val = int(data[key])
        except Exception:
            pass
        _NATIVE_NTT_MEASURED = val
    return _NATIVE_NTT_MEASURED


_NATIVE_NTT_MEASURED = None


def _concrete(*arrays) -> bool:
    import jax.core
    return not any(isinstance(a, jax.core.Tracer) for a in arrays)


class EvaluationDomain:
    def __init__(self, df: DeviceField, j: int, k: int):
        """j = circuit degree (quotient_poly_degree + 1), k = log2(rows)."""
        spec = df.spec
        p = spec.modulus
        self.df = df
        self.k = k
        self.n = 1 << k
        self.quotient_poly_degree = j - 1
        extended_k = k
        while (1 << extended_k) < self.n * self.quotient_poly_degree:
            extended_k += 1
        assert extended_k <= spec.s
        self.extended_k = extended_k
        self.extended_n = 1 << extended_k

        self.extended_omega = pow(spec.root_of_unity,
                                  1 << (spec.s - extended_k), p)
        self.omega = pow(self.extended_omega, 1 << (extended_k - k), p)
        self.omega_inv = pow(self.omega, p - 2, p)
        self.extended_omega_inv = pow(self.extended_omega, p - 2, p)
        self.g_coset = spec.zeta
        self.g_coset_inv = spec.zeta * spec.zeta % p
        self.barycentric_weight = pow(self.n, p - 2, p)

        # t(X) = X^n - 1 on the coset: t(ζ ω_ext^i) = ζ^n ω_ext^{ni} - 1,
        # periodic with 2^(extended_k - k) distinct values (domain.rs:88-111)
        orig = pow(spec.zeta, self.n, p)
        step = pow(self.extended_omega, self.n, p)
        t_evals = []
        cur = orig
        while True:
            t_evals.append((cur - 1) % p)
            cur = cur * step % p
            if cur == orig:
                break
        assert len(t_evals) == 1 << (extended_k - k)
        t_inv = [pow(t, p - 2, p) for t in t_evals]
        reps = self.extended_n // len(t_inv)
        self._t_inv_tiled = jnp.asarray(
            np.tile(np.asarray(df.to_mont_np(t_inv)).reshape(-1, NLIMBS),
                    (reps, 1)))

        # zeta-power coset patterns: index i gets [1, ζ, ζ²][i % 3]
        # (into coset) or [1, ζ², ζ][i % 3] (out of coset) — domain.rs:357-373
        def pattern(c0, c1, length):
            vals = [[1, c0, c1][i % 3] for i in range(length)]
            return jnp.asarray(np.asarray(df.to_mont_np(vals))
                               .reshape(length, NLIMBS))
        self._coset_in = pattern(self.g_coset, self.g_coset_inv, self.n)
        self._coset_out_ext = pattern(self.g_coset_inv, self.g_coset,
                                      self.extended_n)

        # NTT plans
        self.plan = make_plan(df, self.n, self.omega)
        self.plan_inv = make_plan(df, self.n, self.omega_inv)
        self.plan_ext = make_plan(df, self.extended_n, self.extended_omega)
        self.plan_ext_inv = make_plan(df, self.extended_n,
                                      self.extended_omega_inv)
        self._ifft_divisor = jnp.asarray(int_to_limbs(
            pow(self.n, p - 2, p) * (1 << 256) % p))
        self._ext_ifft_divisor = jnp.asarray(int_to_limbs(
            pow(self.extended_n, p - 2, p) * (1 << 256) % p))

        # Montgomery-form host constants for the native NTT path
        R = 1 << 256
        self._m = {
            "one": R % p,
            "omega": self.omega * R % p,
            "omega_inv": self.omega_inv * R % p,
            "ext_omega": self.extended_omega * R % p,
            "ext_omega_inv": self.extended_omega_inv * R % p,
            "n_inv": pow(self.n, p - 2, p) * R % p,
            "ext_n_inv": pow(self.extended_n, p - 2, p) * R % p,
            "zeta": self.g_coset * R % p,
            "zeta_inv": self.g_coset_inv * R % p,
        }
        self._native_idx_cache = -1  # unresolved

    # ---------------- native host path (small domains) ----------------
    def _native_idx(self):
        if _os.environ.get("HALO2_TPU_NO_NATIVE"):
            return None
        if self._native_idx_cache == -1:
            from ..curves import native
            if native._load() is None:
                self._native_idx_cache = None
            else:
                self._native_idx_cache = native.field_idx(self.df.spec)
        return self._native_idx_cache

    def _use_native(self, *arrays) -> bool:
        return (self.n <= native_ntt_max() and _concrete(*arrays)
                and self._native_idx() is not None)

    def _native_l2c(self, col_u64: np.ndarray) -> None:
        """In-place Lagrange -> coeff (iNTT + 1/n) on (n,4) u64 mont."""
        from ..curves import native
        idx = self._native_idx()
        native.ntt_inplace(idx, col_u64, self._m["omega_inv"])
        native.powmul_inplace(idx, col_u64, self._m["one"],
                              self._m["n_inv"], 1)

    def _native_c2e(self, col_u64: np.ndarray) -> np.ndarray:
        """coeff (n,4) -> extended coset (ext_n,4), fresh array."""
        from ..curves import native
        idx = self._native_idx()
        ext = np.zeros((self.extended_n, 4), np.uint64)
        ext[:self.n] = col_u64
        native.powmul_inplace(idx, ext[:self.n], self._m["zeta"],
                              self._m["one"], 3)
        native.ntt_inplace(idx, ext, self._m["ext_omega"])
        return ext

    def lagrange_to_coeff_extended_many_host(self, cols_u64: list):
        """Host-origin variant of lagrange_to_coeff_extended_many for the
        keygen path: takes native-layout Montgomery (n, 4) u64 arrays
        (never resident on device), runs the native NTT pipeline, and
        uploads ONLY the results — no device readback, which on the
        tunneled backend can stall minutes on a fresh process. Returns
        None when the native library is unavailable (callers fall back
        to the device transform)."""
        import os as _os2
        if (_os2.environ.get("HALO2_TPU_NO_NATIVE")
                or self._native_idx() is None):
            return None
        polys, cosets = [], []
        for col in cols_u64:
            col = np.ascontiguousarray(col, dtype=np.uint64).copy()
            self._native_l2c(col)
            ext = self._native_c2e(col)
            polys.append(self.df.upload_mont(col))
            cosets.append(self.df.upload_mont(ext))
        return polys, cosets

    # ---------------- mesh-sharded transforms ----------------
    def _mesh_ctx(self):
        """Active ProverMesh when both domain sizes divide cleanly for
        the four-step NTT (D^2 | n), else None."""
        from ..parallel import context
        ctx = context.active()
        if (ctx is not None and ctx.divides(self.n)
                and ctx.divides(self.extended_n)):
            return ctx
        return None

    def _mesh_plans(self, ctx):
        from ..parallel.mesh import ShardedNttPlan
        cache = getattr(self, "_mesh_plan_cache", None)
        if cache is None:
            cache = self._mesh_plan_cache = {}
        plans = cache.get(ctx.ndev)
        if plans is None:
            df = self.df
            plans = {
                "fwd": ShardedNttPlan(df, self.n, self.omega, ctx.ndev),
                "inv": ShardedNttPlan(df, self.n, self.omega_inv,
                                      ctx.ndev),
                "ext": ShardedNttPlan(df, self.extended_n,
                                      self.extended_omega, ctx.ndev),
                "ext_inv": ShardedNttPlan(df, self.extended_n,
                                          self.extended_omega_inv,
                                          ctx.ndev),
            }
            cache[ctx.ndev] = plans
        return plans

    def _mesh_l2c(self, ctx, values: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.mesh import sharded_ntt
        x = sharded_ntt(self.df, ctx.mesh, self._mesh_plans(ctx)["inv"],
                        ctx.shard_rows(values))
        return fmul(self.df, x,
                    jnp.broadcast_to(self._ifft_divisor, x.shape))

    def _mesh_c2e(self, ctx, coeffs: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.mesh import sharded_ntt
        a = fmul(self.df, coeffs, self._coset_in)
        pad = jnp.zeros((self.extended_n - self.n, NLIMBS), dtype=a.dtype)
        padded = ctx.shard_rows(jnp.concatenate([a, pad], axis=0))
        return sharded_ntt(self.df, ctx.mesh,
                           self._mesh_plans(ctx)["ext"], padded)

    def _mesh_e2c(self, ctx, values: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.mesh import sharded_ntt
        x = sharded_ntt(self.df, ctx.mesh,
                        self._mesh_plans(ctx)["ext_inv"],
                        ctx.shard_rows(values))
        x = fmul(self.df, x,
                 jnp.broadcast_to(self._ext_ifft_divisor, x.shape))
        return fmul(self.df, x, self._coset_out_ext)

    # ---------------- transforms (device) ----------------
    _BATCH_XFORM_JIT: dict = {}

    def lagrange_to_coeff_extended_many(self, values_list: list):
        """Batched fused transform for a phase's columns: m Lagrange
        vectors -> (m coeff polys, m extended-coset vectors) in ONE
        jitted dispatch (iNTT + scale + coset-zeta + zero-pad + extended
        NTT, all m columns together). The eager per-column path costs
        ~6 dispatch round-trips per column on a tunneled device."""
        m = len(values_list)
        if m == 0:
            return [], []
        ctx = self._mesh_ctx()
        if ctx is not None:
            polys = [self._mesh_l2c(ctx, v) for v in values_list]
            cosets = [self._mesh_c2e(ctx, p) for p in polys]
            return polys, cosets
        # Memory ceiling: the fused m-column transform materializes
        # several [m, extended_n, 16] stage intermediates at once; at
        # k=17 a 10-column phase asked for 20 GiB vs 16 GiB HBM. Chunk
        # m so m * extended_n stays under the budget.
        budget = int(_os.environ.get("HALO2_TPU_NTT_BATCH_BUDGET",
                                     str(1 << 21)))
        # Cap chunks at 4 columns: with the fixed padding below, EVERY
        # batched transform in a prove then runs through the single
        # (domain, m=4) executable — executable loads dominate
        # fresh-process proves on the tunneled runtime (~1.4 MB/s
        # first-call transfer; these pipelines compile to tens of MB),
        # so one shared program beats per-phase m buckets even though
        # wide phases now take ceil(m/4) dispatches.
        m_fixed = min(max(1, budget // self.extended_n), 4)
        m_chunk = m_fixed
        if m > m_chunk:
            polys, cosets = [], []
            for i in range(0, m, m_chunk):
                p, c = self.lagrange_to_coeff_extended_many(
                    values_list[i:i + m_chunk])
                polys.extend(p)
                cosets.extend(c)
            return polys, cosets
        if self._use_native(*values_list):
            from ..curves import native
            stacked = np.asarray(jnp.stack(values_list))  # one readback
            polys, cosets = [], []
            for j in range(m):
                col = np.ascontiguousarray(
                    native.dev_mont_to_u64(stacked[j]))
                self._native_l2c(col)
                ext = self._native_c2e(col)
                polys.append(jnp.asarray(native.u64_to_dev_mont(col)))
                cosets.append(jnp.asarray(native.u64_to_dev_mont(ext)))
            return polys, cosets
        # Shape canonicalization: the device paths compile one
        # executable per column count m — pad every chunk to the FIXED
        # width 4 with zero columns (their transforms are zero; sliced
        # off below) so all phases of a prove share ONE program.
        m_req = m
        m_pad = m_fixed
        if m < m_pad:
            zero_col = jnp.zeros_like(values_list[0])
            values_list = list(values_list) + [zero_col] * (m_pad - m)
            m = m_pad
        if _use_mxu(self.n) or _use_mxu(self.extended_n):
            # four-step MXU path for whichever transform is big enough;
            # a few extra dispatches vs the fully-fused jit, but the
            # twiddle matmuls win at these sizes
            from ..ops.mxu_field import ntt_mxu_b
            from ..ops.ntt import ntt_many
            df = self.df
            vals = jnp.stack(values_list, axis=0)
            intt_b = (ntt_mxu_b if _use_mxu(self.n) else ntt_many)
            x = intt_b(df, vals, self.plan_inv)
            polys = fmul(df, x, jnp.broadcast_to(self._ifft_divisor,
                                                 x.shape))
            a = fmul(df, polys, self._coset_in[None])
            pad = jnp.zeros((m, self.extended_n - self.n, NLIMBS),
                            dtype=a.dtype)
            padded = jnp.concatenate([a, pad], axis=1)
            ntt_b = (ntt_mxu_b if _use_mxu(self.extended_n) else ntt_many)
            cosets = ntt_b(df, padded, self.plan_ext)
            return ([polys[j] for j in range(m_req)],
                    [cosets[j] for j in range(m_req)])
        import jax
        from ..ops.ntt import _plan_dev, _ntt_impl_b
        df = self.df
        n, ext_n = self.n, self.extended_n
        perm_i, tws_i = _plan_dev(self.plan_inv)
        perm_e, tws_e = _plan_dev(self.plan_ext)
        key = (id(self), m)
        fn = EvaluationDomain._BATCH_XFORM_JIT.get(key)
        if fn is None:
            n_i = len(tws_i)

            def impl(vals, pm_i, pm_e, ifd, cin, *tw):
                tws_i_, tws_e_ = tw[:n_i], tw[n_i:]
                x = _ntt_impl_b(df, vals, pm_i, tws_i_)
                polys = fmul(df, x, jnp.broadcast_to(ifd, x.shape))
                a = fmul(df, polys, cin[None])
                pad = jnp.zeros((m, ext_n - n, NLIMBS), dtype=a.dtype)
                ext = _ntt_impl_b(df, jnp.concatenate([a, pad], axis=1),
                                  pm_e, tws_e_)
                return polys, ext
            fn = jax.jit(impl)
            EvaluationDomain._BATCH_XFORM_JIT[key] = fn
        vals = jnp.stack(values_list, axis=0)
        polys, cosets = fn(vals, perm_i, perm_e, self._ifft_divisor,
                           self._coset_in, *tws_i, *tws_e)
        return ([polys[j] for j in range(m_req)],
                [cosets[j] for j in range(m_req)])

    def lagrange_to_coeff(self, values: jnp.ndarray) -> jnp.ndarray:
        assert values.shape[0] == self.n
        ctx = self._mesh_ctx()
        if ctx is not None:
            return self._mesh_l2c(ctx, values)
        if self._use_native(values):
            from ..curves import native
            col = np.ascontiguousarray(
                native.dev_mont_to_u64(np.asarray(values)))
            self._native_l2c(col)
            return jnp.asarray(native.u64_to_dev_mont(col))
        x = _ntt_dispatch(self.df, values, self.plan_inv)
        return fmul(self.df, x,
                    jnp.broadcast_to(self._ifft_divisor, x.shape))

    def coeff_to_lagrange(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        ctx = self._mesh_ctx()
        if ctx is not None:
            from ..parallel.mesh import sharded_ntt
            return sharded_ntt(self.df, ctx.mesh,
                               self._mesh_plans(ctx)["fwd"],
                               ctx.shard_rows(coeffs))
        if self._use_native(coeffs):
            from ..curves import native
            col = np.ascontiguousarray(
                native.dev_mont_to_u64(np.asarray(coeffs)))
            native.ntt_inplace(self._native_idx(), col, self._m["omega"])
            return jnp.asarray(native.u64_to_dev_mont(col))
        return _ntt_dispatch(self.df, coeffs, self.plan)

    def coeff_to_extended(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        assert coeffs.shape[0] == self.n
        ctx = self._mesh_ctx()
        if ctx is not None:
            return self._mesh_c2e(ctx, coeffs)
        if self._use_native(coeffs):
            from ..curves import native
            col = np.ascontiguousarray(
                native.dev_mont_to_u64(np.asarray(coeffs)))
            return jnp.asarray(native.u64_to_dev_mont(
                self._native_c2e(col)))
        a = fmul(self.df, coeffs, self._coset_in)
        pad = jnp.zeros((self.extended_n - self.n, NLIMBS), dtype=a.dtype)
        return _ntt_dispatch(self.df, jnp.concatenate([a, pad], axis=0),
                             self.plan_ext)

    def extended_to_coeff(self, values: jnp.ndarray) -> jnp.ndarray:
        """iFFT + un-coset; returns all extended_n coefficients (caller
        truncates to n * quotient_poly_degree, domain.rs:303-325)."""
        assert values.shape[0] == self.extended_n
        ctx = self._mesh_ctx()
        if ctx is not None:
            return self._mesh_e2c(ctx, values)
        if self._use_native(values):
            from ..curves import native
            idx = self._native_idx()
            col = np.ascontiguousarray(
                native.dev_mont_to_u64(np.asarray(values)))
            native.ntt_inplace(idx, col, self._m["ext_omega_inv"])
            # un-coset pattern [1, z^2, z^4=z][i%3] scaled by 1/ext_n
            native.powmul_inplace(idx, col, self._m["zeta_inv"],
                                  self._m["ext_n_inv"], 3)
            return jnp.asarray(native.u64_to_dev_mont(col))
        x = _ntt_dispatch(self.df, values, self.plan_ext_inv)
        x = fmul(self.df, x,
                 jnp.broadcast_to(self._ext_ifft_divisor, x.shape))
        return fmul(self.df, x, self._coset_out_ext)

    def divide_by_vanishing_poly(self, values: jnp.ndarray) -> jnp.ndarray:
        return fmul(self.df, values, self._t_inv_tiled)

    def rotate_extended(self, values: jnp.ndarray, rotation: int
                        ) -> jnp.ndarray:
        shift = (1 << (self.extended_k - self.k)) * rotation
        return jnp.roll(values, -shift, axis=0)

    # ---------------- host scalar helpers ----------------
    def rotate_omega(self, value: int, rotation: int) -> int:
        p = self.df.spec.modulus
        if rotation >= 0:
            return value * pow(self.omega, rotation, p) % p
        return value * pow(self.omega_inv, -rotation, p) % p

    def l_i_range(self, x: int, xn: int, rotations) -> list[int]:
        """Barycentric evaluations of Lagrange basis polys l_i(x) for i over
        `rotations` (domain.rs:447-472). Host-side O(|rotations|)."""
        p = self.df.spec.modulus
        results = [(x - self.rotate_omega(1, rot)) % p for rot in rotations]
        results = [pow(r, p - 2, p) for r in results]
        common = (xn - 1) * self.barycentric_weight % p
        return [self.rotate_omega(r * common % p, rot)
                for rot, r in zip(rotations, results)]

    def pinned(self) -> dict:
        """Minimal parameters determining the domain
        (PinnedEvaluationDomain, domain.rs:482-498)."""
        return {"k": self.k, "extended_k": self.extended_k,
                "omega": self.omega}
