"""Permutation argument: global copy constraints via chunked grand products.

Reference: halo2_proofs/src/plonk/permutation/ —
  keygen.rs:16-100 (cycle-merge Assembly), :102-211 (σ = δ^i ω^j tables,
  build_vk/build_pk); prover.rs:47-194 (chunked fraction products with
  chained last_z), :199-312 (4 constraint families); verifier.rs:33-241.

TPU formulation: the σ tables are a device outer-product (δ-powers ×
ω-powers) gathered through the host-built mapping; the per-chunk fraction
batch is one batched inversion + elementwise products; the running product
z becomes an exclusive associative-scan product scaled by the chained
last_z. The constraint families are evaluated directly as fused device
programs over the extended domain.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, fadd, fsub, fmul, fneg,
                             batch_inv, fselect, running_product)
from ..poly.utils import powers, eval_poly
from ..poly.domain import EvaluationDomain
from .circuit import (ConstraintSystem, Column, PermutationArgument,
                      ADVICE, FIXED, INSTANCE)


class PermutationAssembly:
    """Cycle-tracking assignment sink (keygen.rs:16-100)."""

    def __init__(self, n: int, argument: PermutationArgument):
        m = len(argument.columns)
        self.n = n
        self.columns = list(argument.columns)
        self.col_index = {c: i for i, c in enumerate(self.columns)}
        # mapping/aux as int32 [m, n] pairs
        idx = np.tile(np.arange(n, dtype=np.int64)[None, :], (m, 1))
        cols = np.tile(np.arange(m, dtype=np.int64)[:, None], (1, n))
        self.map_col = cols.copy()
        self.map_row = idx.copy()
        self.aux_col = cols.copy()
        self.aux_row = idx.copy()
        self.sizes = np.ones((m, n), dtype=np.int64)

    def copy(self, left_column: Column, left_row: int,
             right_column: Column, right_row: int) -> None:
        if left_column not in self.col_index:
            raise ValueError(f"column {left_column} not in permutation")
        if right_column not in self.col_index:
            raise ValueError(f"column {right_column} not in permutation")
        lc = self.col_index[left_column]
        rc = self.col_index[right_column]
        if left_row >= self.n or right_row >= self.n:
            raise IndexError("copy row out of bounds")

        left_cycle = (self.aux_col[lc, left_row], self.aux_row[lc, left_row])
        right_cycle = (self.aux_col[rc, right_row],
                       self.aux_row[rc, right_row])
        if left_cycle == right_cycle:
            return
        if (self.sizes[left_cycle] < self.sizes[right_cycle]):
            left_cycle, right_cycle = right_cycle, left_cycle
        self.sizes[left_cycle] += self.sizes[right_cycle]
        i = right_cycle
        while True:
            self.aux_col[i], self.aux_row[i] = left_cycle
            i = (self.map_col[i], self.map_row[i])
            if i == right_cycle:
                break
        lpos = (lc, left_row)
        rpos = (rc, right_row)
        tmp = (self.map_col[lpos], self.map_row[lpos])
        self.map_col[lpos], self.map_row[lpos] = (self.map_col[rpos],
                                                  self.map_row[rpos])
        self.map_col[rpos], self.map_row[rpos] = tmp

    # ---- σ polynomial construction (keygen.rs:102-211) ----
    def _deltaomega(self, df: DeviceField, domain: EvaluationDomain
                    ) -> jnp.ndarray:
        """[m, n, 16]: δ^i · ω^j, built on device."""
        m = len(self.columns)
        omega_pow = powers(df, df.scalar(domain.omega), self.n)      # [n,16]
        delta_pow = powers(df, df.scalar(df.spec.delta), m)          # [m,16]
        return fmul(df, delta_pow[:, None, :], omega_pow[None, :, :])

    def sigma_lagrange_host(self, df: DeviceField, domain: EvaluationDomain):
        """Native host σ columns as Montgomery (n, 4) u64 numpy arrays
        (None when the native library is unavailable): the δ^i·ω^j table
        is n·m field multiplies (pasta_powmul) and the cycle mapping is
        a numpy gather."""
        import os
        from ..curves import native
        m, n = len(self.columns), self.n
        idx = (None if os.environ.get("HALO2_TPU_NO_NATIVE")
               else native.field_idx(df.spec))
        if idx is None:
            return None
        p = df.spec.modulus
        R = 1 << 256
        one_m = np.frombuffer(int(R % p).to_bytes(32, "little"), np.uint64)
        omega_mont = domain.omega * R % p
        dw = np.empty((m, n, 4), np.uint64)
        for i in range(m):
            row = np.tile(one_m, (n, 1))
            scale_mont = pow(df.spec.delta, i, p) * R % p
            native.powmul_inplace(idx, row, omega_mont, scale_mont, 0)
            dw[i] = row
        flat = dw.reshape(-1, 4)
        return [np.ascontiguousarray(
            flat[(self.map_col[i] * n + self.map_row[i]).reshape(-1)])
            for i in range(m)]

    def sigma_lagrange(self, df: DeviceField, domain: EvaluationDomain
                       ) -> list[jnp.ndarray]:
        """One [n,16] σ array per permutation column.

        Native host path when available: the δ^i·ω^j table is n·m field
        multiplies (pasta_powmul) and the cycle-mapping gather is a
        numpy index — building this on device cost minutes of XLA
        compile at k=16 for what is microseconds of arithmetic."""
        host = self.sigma_lagrange_host(df, domain)
        if host is not None:
            return [df.upload_mont(h) for h in host]
        dw = self._deltaomega(df, domain)          # [m, n, 16]
        flat = dw.reshape(-1, NLIMBS)
        out = []
        for i in range(len(self.columns)):
            gather = jnp.asarray(self.map_col[i] * self.n + self.map_row[i],
                                 dtype=jnp.int32)
            out.append(flat[gather])
        return out


def build_vk(params, domain: EvaluationDomain, assembly: PermutationAssembly):
    """Commit to σ columns unblinded (keygen.rs:102-153)."""
    from ..poly.commitment import DEFAULT_BLIND
    from .prover import _PhaseTimer
    prof = _PhaseTimer(tag="perm_vk")
    if not assembly.columns:
        return []
    host = assembly.sigma_lagrange_host(params.scalar_df, domain)
    if host is not None:
        prof.lap("sigma_lagrange host")
        out = params.commit_native_many(
            np.stack(host), [DEFAULT_BLIND] * len(host), lagrange=True,
            mont=True)
        if out is not None:
            prof.lap(f"native commit m={len(host)}")
            return out
        sigmas = [params.scalar_df.upload_mont(h) for h in host]
    else:
        sigmas = assembly.sigma_lagrange(params.scalar_df, domain)
    prof.lap("sigma_lagrange")
    out = params.commit_many(sigmas, [DEFAULT_BLIND] * len(sigmas),
                             lagrange=True)
    prof.lap(f"commit_many m={len(sigmas)}")
    return out


@dataclass
class PermutationProvingKey:
    permutations: list   # σ in Lagrange basis
    polys: list          # σ in coeff basis
    cosets: list         # σ in extended-coset basis


def build_pk(params, domain: EvaluationDomain,
             assembly: PermutationAssembly) -> PermutationProvingKey:
    df = params.scalar_df
    host = assembly.sigma_lagrange_host(df, domain)
    if host is not None:
        res = domain.lagrange_to_coeff_extended_many_host(host)
        if res is not None:
            sigmas = [df.upload_mont(h) for h in host]
            return PermutationProvingKey(permutations=sigmas,
                                         polys=res[0], cosets=res[1])
        sigmas = [df.upload_mont(h) for h in host]
    else:
        sigmas = assembly.sigma_lagrange(df, domain)
    polys, cosets = domain.lagrange_to_coeff_extended_many(sigmas)
    return PermutationProvingKey(permutations=sigmas, polys=polys,
                                 cosets=cosets)


@dataclass
class CommittedSet:
    z_lagrange: jnp.ndarray
    z_poly: jnp.ndarray      # coeff basis
    z_coset: jnp.ndarray     # extended basis
    blind: int


def _values_for(column: Column, advice, fixed, instance):
    return {ADVICE: advice, FIXED: fixed, INSTANCE: instance}[
        column.column_type][column.index]


_Z_CHUNK_JIT: dict = {}


def _z_chunk(df: DeviceField, n: int, cl: int, values, sigmas,
             beta_m, gamma_m, lastz_m, deltas_m, omega_pow):
    """One chunk's z scan as ONE jitted program: denominator fraction
    batch (batched inversion), numerator products, exclusive running
    product scaled by the chained last_z. values/sigmas [cl, n, 16];
    deltas_m [cl, 16] = beta * delta^{global_col..} in Montgomery form."""
    key = (id(df), n, cl)
    fn = _Z_CHUNK_JIT.get(key)
    if fn is None:
        def impl(vals, sigs, b_m, g_m, lz_m, d_m, om):
            g = jnp.broadcast_to(g_m, (cl, n, NLIMBS))
            den = fadd(df, vals,
                       fadd(df, fmul(df, jnp.broadcast_to(
                           b_m, sigs.shape), sigs), g))
            num = fadd(df, vals,
                       fadd(df, fmul(df, om[None],
                                     jnp.broadcast_to(d_m[:, None, :],
                                                      (cl, n, NLIMBS))), g))
            modified = den[0]
            for j in range(1, cl):
                modified = fmul(df, modified, den[j])
            modified = batch_inv(df, modified, axis=0)
            for j in range(cl):
                modified = fmul(df, modified, num[j])
            incl = running_product(df, modified, axis=0)
            return jnp.concatenate([
                jnp.broadcast_to(lz_m, (1, NLIMBS)),
                fmul(df, incl[:-1],
                     jnp.broadcast_to(lz_m, (n - 1, NLIMBS)))], axis=0)
        import jax
        fn = jax.jit(impl)
        _Z_CHUNK_JIT[key] = fn
    return fn(values, sigmas, beta_m, gamma_m, lastz_m, deltas_m, omega_pow)


def _z_chunk_mesh(df, ctx, n, cl, values, sigmas, beta_m, gamma_m,
                  lastz_m, deltas_m, omega_pow):
    """Mesh-sharded z chunk as ONE jitted program: row-sharded fraction
    products, shard-local batched inversion, sharded scan + cross-shard
    prefix. Field math is exact => bit-identical to _z_chunk."""
    from ..parallel.mesh import sharded_batch_inv, sharded_inclusive_product
    key = ("mesh", id(df), id(ctx.mesh), n, cl)
    fn = _Z_CHUNK_JIT.get(key)
    if fn is None:
        mesh = ctx.mesh

        def impl(vals, sigs, b_m, g_m, lz_m, d_m, om):
            g = jnp.broadcast_to(g_m, (n, NLIMBS))
            b = jnp.broadcast_to(b_m, (n, NLIMBS))
            den = None
            num = None
            for j in range(cl):
                dj = fadd(df, vals[j], fadd(df, fmul(df, b, sigs[j]), g))
                den = dj if den is None else fmul(df, den, dj)
                nj = fadd(df, vals[j], fadd(
                    df, fmul(df, om,
                             jnp.broadcast_to(d_m[j], (n, NLIMBS))), g))
                num = nj if num is None else fmul(df, num, nj)
            modified = fmul(df, sharded_batch_inv(df, mesh, den), num)
            incl = sharded_inclusive_product(df, mesh, modified)
            lz = jnp.broadcast_to(lz_m, (n - 1, NLIMBS))
            return jnp.concatenate([
                jnp.broadcast_to(lz_m, (1, NLIMBS)),
                fmul(df, incl[:-1], lz)], axis=0)
        import jax
        fn = jax.jit(impl)
        _Z_CHUNK_JIT[key] = fn
    # values/sigmas arrive as [cl, n, 16] stacks; the shard_map
    # in_specs inside reshard rows as needed
    return fn(values, sigmas, beta_m, gamma_m, lastz_m, deltas_m,
              ctx.shard_rows(omega_pow))


def permutation_commit(cs: ConstraintSystem, params, domain,
                       pkey: PermutationProvingKey,
                       advice, fixed, instance,
                       beta: int, gamma: int, rng, transcript
                       ) -> list[CommittedSet]:
    """prover.rs:47-194. advice/fixed/instance: lists of [n,16] Lagrange
    device arrays. Per chunk: one fused z-scan dispatch (+ a last_z
    readback, serial across chunks by construction); the commitments and
    basis transforms of ALL chunks are then batched into single
    dispatches (transcript order preserved — points are written after
    every z is known, exactly as the reference emits them in order)."""
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n
    assert cs.degree() >= 3
    chunk_len = cs.degree() - 2
    blinding_factors = cs.blinding_factors()
    columns = cs.permutation.columns

    beta_m = df.scalar(beta)
    gamma_m = df.scalar(gamma)
    omega_pow = powers(df, df.scalar(domain.omega), n)   # [n,16]

    global_col = 0          # delta exponent carried across chunks
    last_z = 1
    z_arrays: list[jnp.ndarray] = []
    blinds_out: list[int] = []

    for chunk_start in range(0, len(columns), chunk_len):
        chunk = columns[chunk_start:chunk_start + chunk_len]
        perms = pkey.permutations[chunk_start:chunk_start + chunk_len]
        cl = len(chunk)

        vals = jnp.stack([_values_for(c, advice, fixed, instance)
                          for c in chunk], axis=0)
        sigs = jnp.stack(perms, axis=0)
        p = df.spec.modulus
        deltas = [beta * pow(df.spec.delta, global_col + j, p) % p
                  for j in range(cl)]
        global_col += cl
        deltas_m = jnp.asarray(np.asarray(df.to_mont_np(deltas))
                               .reshape(cl, NLIMBS))
        from ..parallel import context as mesh_context
        ctx = mesh_context.active()
        if ctx is not None and n % (ctx.ndev * ctx.ndev) == 0:
            z = _z_chunk_mesh(df, ctx, n, cl, vals, sigs, beta_m,
                              gamma_m, df.scalar(last_z), deltas_m,
                              omega_pow)
        else:
            z = _z_chunk(df, n, cl, vals, sigs, beta_m, gamma_m,
                         df.scalar(last_z), deltas_m, omega_pow)

        # blinding rows
        blinds = [fs.rand(rng) for _ in range(blinding_factors)]
        z_np = np.asarray(df.to_mont_np(blinds)).reshape(-1, NLIMBS)
        z = jnp.concatenate([z[:n - blinding_factors], jnp.asarray(z_np)],
                            axis=0)
        last_z = int(df.from_mont_np(
            np.asarray(z[n - (blinding_factors + 1)])))
        z_arrays.append(z)
        blinds_out.append(fs.rand(rng))

    import os
    if columns and os.environ.get("HALO2_TPU_SANITY"):
        # the chained grand product over ALL chunks must telescope back
        # to 1 (σ is a bijection on the usable rows); last_z after the
        # final chunk IS that total product
        assert last_z == 1, \
            "permutation grand product does not telescope (last_z != 1)"

    commitments = params.commit_many(z_arrays, blinds_out, lagrange=True)
    z_polys, z_cosets = domain.lagrange_to_coeff_extended_many(z_arrays)
    sets: list[CommittedSet] = []
    for z, zp, zc, blind, commitment in zip(z_arrays, z_polys, z_cosets,
                                            blinds_out, commitments):
        transcript.write_point(commitment)
        sets.append(CommittedSet(z_lagrange=z, z_poly=zp, z_coset=zc,
                                 blind=blind))
    return sets


def permutation_h_terms(cs: ConstraintSystem, domain, pkey,
                        sets: list[CommittedSet],
                        advice_cosets, fixed_cosets, instance_cosets,
                        l0, l_blind, l_last, coset_pts,
                        beta: int, gamma: int) -> list[jnp.ndarray]:
    """The 4 constraint families (prover.rs:199-312) as extended arrays."""
    df = domain.df
    rot_scale = 1 << (domain.extended_k - domain.k)
    chunk_len = cs.degree() - 2
    blinding_factors = cs.blinding_factors()
    last_rot = -((blinding_factors + 1))
    columns = cs.permutation.columns
    one = df.ones((domain.extended_n,))
    beta_m = df.scalar(beta)
    gamma_m = df.scalar(gamma)

    out = []
    if sets:
        # l_0(X) * (1 - z_0(X))
        out.append(fmul(df, fsub(df, one, sets[0].z_coset), l0))
        # l_last(X) * (z_l(X)^2 - z_l(X))
        zl = sets[-1].z_coset
        out.append(fmul(df, fsub(df, fmul(df, zl, zl), zl), l_last))
        # l_0(X) * (z_i(X) - z_{i-1}(omega^last X))
        for prev, cur in zip(sets, sets[1:]):
            rolled = jnp.roll(prev.z_coset, -last_rot * rot_scale, axis=0)
            out.append(fmul(df, fsub(df, cur.z_coset, rolled), l0))
        # product rule per chunk
        active = fsub(df, one, fadd(df, l_last, l_blind))
        for chunk_index, chunk_start in enumerate(
                range(0, len(columns), chunk_len)):
            chunk = columns[chunk_start:chunk_start + chunk_len]
            cosets = pkey.cosets[chunk_start:chunk_start + chunk_len]
            s = sets[chunk_index]
            left = jnp.roll(s.z_coset, -1 * rot_scale, axis=0)
            for column, sigma_coset in zip(chunk, cosets):
                values = _values_for(column, advice_cosets, fixed_cosets,
                                     instance_cosets)
                left = fmul(df, left, fadd(
                    df, values,
                    fadd(df, fmul(df, jnp.broadcast_to(beta_m,
                                                       sigma_coset.shape),
                                  sigma_coset),
                         jnp.broadcast_to(gamma_m, sigma_coset.shape))))
            right = s.z_coset
            cur_delta = beta * pow(df.spec.delta, chunk_index * chunk_len,
                                   df.spec.modulus) % df.spec.modulus
            for column in chunk:
                values = _values_for(column, advice_cosets, fixed_cosets,
                                     instance_cosets)
                lin = fmul(df, coset_pts,
                           jnp.broadcast_to(df.scalar(cur_delta),
                                            coset_pts.shape))
                right = fmul(df, right, fadd(
                    df, values, fadd(df, lin,
                                     jnp.broadcast_to(gamma_m,
                                                      coset_pts.shape))))
                cur_delta = cur_delta * df.spec.delta % df.spec.modulus
            out.append(fmul(df, fsub(df, left, right), active))
    return out


def permutation_evaluate(sets: list[CommittedSet], domain, cs, x: int,
                         df, transcript, eval_fn=None) -> None:
    """prover.rs:341-384 eval order: per set (x, ωx[, ω^last x])."""
    blinding_factors = cs.blinding_factors()
    x_next = domain.rotate_omega(x, 1)
    x_last = domain.rotate_omega(x, -(blinding_factors + 1))
    if eval_fn is None:
        eval_fn = lambda poly, pt: int(df.from_mont_np(np.asarray(
            eval_poly(df, poly, df.scalar(pt)))))
    for i, s in enumerate(sets):
        transcript.write_scalar(eval_fn(s.z_poly, x))
        transcript.write_scalar(eval_fn(s.z_poly, x_next))
        if i < len(sets) - 1:
            transcript.write_scalar(eval_fn(s.z_poly, x_last))


def permutation_pk_evaluate(pkey: PermutationProvingKey, df, x: int,
                            transcript, eval_fn=None) -> None:
    """σ-poly evals at x (prover.rs:315-339)."""
    if eval_fn is None:
        eval_fn = lambda poly, pt: int(df.from_mont_np(np.asarray(
            eval_poly(df, poly, df.scalar(pt)))))
    for poly in pkey.polys:
        transcript.write_scalar(eval_fn(poly, x))


def permutation_verifier_expressions(
        cs: ConstraintSystem, fs, sets_evals, common_evals,
        advice_evals, fixed_evals, instance_evals,
        l0: int, l_last: int, l_blind: int,
        beta: int, gamma: int, x: int) -> list[int]:
    """verifier.rs:103-191 on host scalars. `sets_evals` is a list of dicts
    with keys eval/next_eval/last_eval."""
    p = fs.modulus
    chunk_len = cs.degree() - 2
    columns = cs.permutation.columns
    out = []
    if sets_evals:
        out.append(l0 * (1 - sets_evals[0]["eval"]) % p)
        zl = sets_evals[-1]["eval"]
        out.append((zl * zl - zl) * l_last % p)
        for prev, cur in zip(sets_evals, sets_evals[1:]):
            out.append((cur["eval"] - prev["last_eval"]) * l0 % p)
        for chunk_index, chunk_start in enumerate(
                range(0, len(columns), chunk_len)):
            chunk = columns[chunk_start:chunk_start + chunk_len]
            perm_evals = common_evals[chunk_start:chunk_start + chunk_len]
            s = sets_evals[chunk_index]
            left = s["next_eval"]
            for column, perm_eval in zip(chunk, perm_evals):
                idx = cs.get_any_query_index(column)
                ev = {ADVICE: advice_evals, FIXED: fixed_evals,
                      INSTANCE: instance_evals}[column.column_type][idx]
                left = left * ((ev + beta * perm_eval + gamma) % p) % p
            right = s["eval"]
            cur_delta = (beta * x % p) * pow(fs.delta,
                                             chunk_index * chunk_len, p) % p
            for column in chunk:
                idx = cs.get_any_query_index(column)
                ev = {ADVICE: advice_evals, FIXED: fixed_evals,
                      INSTANCE: instance_evals}[column.column_type][idx]
                right = right * ((ev + cur_delta + gamma) % p) % p
                cur_delta = cur_delta * fs.delta % p
            out.append((left - right) * (1 - (l_last + l_blind)) % p)
    return out
