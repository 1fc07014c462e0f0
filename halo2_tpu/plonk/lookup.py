"""Lookup argument (halo2's permuted-pair Plookup variant).

Reference: halo2_proofs/src/plonk/lookup/prover.rs —
  commit_permuted (:76-243): θ-compress input/table expressions, permute
  the pair (permute_expression_pair :563-647: sort input, table histogram),
  commit A', S';
  commit_product (:253-392): fraction batch + running product z;
  construct (:401-477): the 5 constraint families;
  evaluate/open (:481-552): 5 evals, ordering preserved.
Verifier: lookup/verifier.rs:34-208.

TPU notes: compression and the product assembly are device programs; the
permuted-pair construction replaces bigint comparisons with dense ranks
(one lexsort over 4x64-bit canonical limbs) and runs the whole
sort/first-occurrence/leftover-fill pipeline as array ops — on device
(multi-key lax.sort + searchsorted) by default, with the numpy
formulation as the oracle/fallback; the grand product is an associative
scan.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.device import (DeviceField, NLIMBS, fadd, fsub, fmul,
                             batch_inv, running_product)
from ..poly.utils import eval_poly
from .circuit import LookupArgument, ConstraintSystem
from .evaluation import evaluate_expression


@dataclass
class Permuted:
    compressed_input: jnp.ndarray     # Lagrange values
    compressed_table: jnp.ndarray
    input_coset_expr: object          # Expression for coset evaluation
    table_coset_expr: object
    permuted_input: jnp.ndarray       # Lagrange
    permuted_table: jnp.ndarray
    permuted_input_poly: jnp.ndarray  # coeff
    permuted_table_poly: jnp.ndarray
    permuted_input_coset: jnp.ndarray
    permuted_table_coset: jnp.ndarray
    permuted_input_blind: int
    permuted_table_blind: int


@dataclass
class CommittedLookup:
    permuted: Permuted
    product_poly: jnp.ndarray
    product_coset: jnp.ndarray
    product_blind: int


def _compress(df, theta_m, arrays):
    acc = None
    for arr in arrays:
        if acc is None:
            acc = arr
        else:
            acc = fadd(df, fmul(df, acc, jnp.broadcast_to(theta_m, acc.shape)),
                       arr)
    return acc


def lookup_commit_permuted(argument: LookupArgument, cs: ConstraintSystem,
                           params, domain, theta: int,
                           advice, fixed, instance,
                           rng, transcript) -> Permuted:
    """advice/fixed/instance: [n,16] Lagrange device arrays."""
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n
    theta_m = df.scalar(theta)

    def values_of(exprs):
        return [evaluate_expression(df, e, advice=advice, fixed=fixed,
                                    instance=instance, rot_scale=1)
                for e in exprs]

    compressed_input = _compress(df, theta_m,
                                 values_of(argument.input_expressions))
    compressed_table = _compress(df, theta_m,
                                 values_of(argument.table_expressions))
    compressed_input = jnp.broadcast_to(compressed_input, (n, NLIMBS))
    compressed_table = jnp.broadcast_to(compressed_table, (n, NLIMBS))

    permuted_input, permuted_table = permute_expression_pair(
        cs, params, rng, compressed_input, compressed_table)

    # A' and S' commit/transform batched: one MSM dispatch + one fused
    # iNTT/coset-NTT dispatch for the pair (lookup/prover.rs:203-227)
    pi_blind = fs.rand(rng)
    pt_blind = fs.rand(rng)
    pi_comm, pt_comm = params.commit_many(
        [permuted_input, permuted_table], [pi_blind, pt_blind],
        lagrange=True)
    (pi_poly, pt_poly), (pi_coset, pt_coset) = (
        domain.lagrange_to_coeff_extended_many(
            [permuted_input, permuted_table]))
    transcript.write_point(pi_comm)
    transcript.write_point(pt_comm)

    return Permuted(
        compressed_input=compressed_input,
        compressed_table=compressed_table,
        input_coset_expr=argument.input_expressions,
        table_coset_expr=argument.table_expressions,
        permuted_input=permuted_input,
        permuted_table=permuted_table,
        permuted_input_poly=pi_poly,
        permuted_table_poly=pt_poly,
        permuted_input_coset=pi_coset,
        permuted_table_coset=pt_coset,
        permuted_input_blind=pi_blind,
        permuted_table_blind=pt_blind,
    )


_PERMUTE_DEV_JIT: dict = {}


def _permute_pair_device_fn(df, usable: int):
    """Build the jitted device permuted-pair program for `usable` rows.

    Same dense-rank pipeline as the numpy oracle below, formulated as
    static-shape XLA ops so no column data ever leaves the device
    (SURVEY.md §2 #21; lookup/prover.rs:563-647):
      - one 9-operand lax.sort of the 2u-row union (8 packed 32-bit key
        words MSB-first + original index payload) yields dense ranks,
      - first-occurrence / leftover-fill run as cumsum/scatter/searchsorted
        over i32 ranks,
      - representatives gather back through the rank->first-position map.
    Returns (permuted_input_mont, permuted_table_mont, ok) where ok is
    the containment flag (the single scalar the host reads back)."""
    from ..fields.device import from_mont, to_mont
    u = usable
    SENT = jnp.int32(2**30)

    def impl(input_mont, table_mont):
        in_can = from_mont(df, input_mont)      # [u, 16] canonical digits
        tab_can = from_mont(df, table_mont)
        union = jnp.concatenate([in_can, tab_can], axis=0)   # [2u, 16]
        # pack 16x16-bit digits -> 8 u32 words, most-significant first
        words = union[:, ::2] | (union[:, 1::2] << 16)       # [2u, 8] LE
        keys = [words[:, j] for j in range(7, -1, -1)]
        idx = jnp.arange(2 * u, dtype=jnp.int32)
        *skeys, sidx = jax.lax.sort(keys + [idx], num_keys=8)
        neq = jnp.zeros((2 * u,), jnp.bool_)
        for kcol in skeys:
            neq = neq | jnp.concatenate(
                [jnp.zeros((1,), jnp.bool_), kcol[1:] != kcol[:-1]])
        ranks_sorted = jnp.cumsum(neq.astype(jnp.int32))     # dense ranks
        ranks = jnp.zeros((2 * u,), jnp.int32).at[sidx].set(ranks_sorted)
        # rank -> first position in the union sort (representative limbs)
        rank_start = jnp.full((2 * u,), 2 * u, jnp.int32).at[
            ranks_sorted].min(idx)
        sorted_union = jnp.take(union, sidx, axis=0)         # [2u, 16]

        in_ranks = jax.lax.sort([ranks[:u]], num_keys=1)[0]  # sorted input
        tab_ranks = jax.lax.sort([ranks[u:]], num_keys=1)[0]
        first = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), in_ranks[1:] != in_ranks[:-1]])
        uniq_q = jnp.where(first, in_ranks, SENT)
        lo = jnp.searchsorted(tab_ranks, uniq_q, side="left").astype(
            jnp.int32)
        hi = jnp.searchsorted(tab_ranks, uniq_q, side="right").astype(
            jnp.int32)
        ok = jnp.all(~first | (hi > lo))   # every unique input in table
        # drop ONE table occurrence per unique input (positions distinct)
        removed = jnp.zeros((u,), jnp.bool_).at[
            jnp.where(first, lo, u)].set(True, mode="drop")
        leftover = jax.lax.sort(
            [jnp.where(removed, SENT, tab_ranks)], num_keys=1)[0]
        n_uniq = jnp.sum(first.astype(jnp.int32))
        r_count = u - n_uniq
        # j-th repeated row (ascending) takes leftover[r_count - 1 - j]
        j = jnp.cumsum((~first).astype(jnp.int32)) - 1
        lidx = jnp.clip(r_count - 1 - j, 0, u - 1)
        perm_tab_ranks = jnp.where(first, in_ranks, jnp.take(leftover, lidx))

        pi_can = jnp.take(sorted_union, jnp.take(rank_start, in_ranks),
                          axis=0)
        pt_can = jnp.take(sorted_union, jnp.take(rank_start, perm_tab_ranks),
                          axis=0)
        return to_mont(df, pi_can), to_mont(df, pt_can), ok

    return jax.jit(impl)


def _use_device_lookup_sort() -> bool:
    import os
    env = os.environ.get("HALO2_TPU_DEVICE_LOOKUP_SORT")
    if env is not None:
        return env not in ("0", "false", "")
    return True


def permute_expression_pair(cs: ConstraintSystem, params, rng,
                            input_values: jnp.ndarray,
                            table_values: jnp.ndarray):
    """lookup/prover.rs:563-647: sort input; first occurrence of each input
    value is mirrored in the table column; remaining table rows are filled
    with leftover table entries (in increasing order, popping repeated-row
    positions from the back).

    Vectorized: 255-bit values are replaced by dense ranks and the whole
    sort/first-occurrence/leftover-fill pipeline runs as array ops. The
    default path is fully on-device (_permute_pair_device_fn — no column
    readback, one containment-flag scalar crosses); the numpy
    formulation below is the oracle and the HALO2_TPU_DEVICE_LOOKUP_SORT=0
    fallback."""
    import os
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n
    blinding_factors = cs.blinding_factors()
    usable = n - (blinding_factors + 1)

    if _use_device_lookup_sort():
        key = (id(df), usable)
        fn = _PERMUTE_DEV_JIT.get(key)
        if fn is None:
            fn = _permute_pair_device_fn(df, usable)
            _PERMUTE_DEV_JIT[key] = fn
        pi_body, pt_body, ok = fn(input_values[:usable],
                                  table_values[:usable])
        if not bool(ok):
            raise ValueError(
                "lookup input not contained in table "
                "(ConstraintSystemFailure)")
        # pi and pt draw separate blind batches; keep the reference's RNG
        # call order (input blinds first, then table blinds)
        pi_blinds = df.upload_canonical_u64(
            native_rand_limbs(fs, rng, blinding_factors + 1))
        pt_blinds = df.upload_canonical_u64(
            native_rand_limbs(fs, rng, blinding_factors + 1))
        pi = jnp.concatenate([pi_body, pi_blinds], axis=0)
        pt = jnp.concatenate([pt_body, pt_blinds], axis=0)
        return pi, pt

    in_limbs = df.from_mont_u64(np.asarray(input_values)[:usable])
    tab_limbs = df.from_mont_u64(np.asarray(table_values)[:usable])

    # dense ranks over the union, ascending in canonical value
    allv = np.concatenate([in_limbs, tab_limbs], axis=0)
    order = np.lexsort((allv[:, 0], allv[:, 1], allv[:, 2], allv[:, 3]))
    svals = allv[order]
    new_grp = np.ones(len(svals), dtype=bool)
    new_grp[1:] = (svals[1:] != svals[:-1]).any(axis=1)
    ranks = np.empty(len(allv), dtype=np.int64)
    ranks[order] = np.cumsum(new_grp) - 1
    ndistinct = int(ranks.max()) + 1
    rep = np.zeros((ndistinct, 4), np.uint64)
    rep[ranks] = allv  # representative limbs per rank

    in_ranks = np.sort(ranks[:usable])          # = sorted inputs
    tab_counts = np.bincount(ranks[usable:], minlength=ndistinct)

    first = np.ones(usable, dtype=bool)
    first[1:] = in_ranks[1:] != in_ranks[:-1]
    uniq = in_ranks[first]
    if (tab_counts[uniq] < 1).any():
        raise ValueError(
            "lookup input not contained in table "
            "(ConstraintSystemFailure)")
    leftover = tab_counts.copy()
    leftover[uniq] -= 1
    # leftover values ascending, assigned to repeated rows popped from
    # the back (BTreeMap iteration + Vec::pop in the reference) — i.e.
    # repeated rows in ascending order get the leftovers DESCENDING
    leftover_ranks = np.repeat(np.arange(ndistinct), leftover)
    repeated = np.nonzero(~first)[0]
    assert len(repeated) == len(leftover_ranks)
    perm_tab_ranks = in_ranks.copy()
    perm_tab_ranks[repeated] = leftover_ranks[::-1]

    if os.environ.get("HALO2_TPU_SANITY"):
        # permuted-pair well-formedness (lookup/prover.rs:628-641):
        # every row has A'[i] == S'[i] or A'[i] == A'[i-1]
        eq_ts = perm_tab_ranks == in_ranks
        eq_prev = np.zeros(usable, dtype=bool)
        eq_prev[1:] = in_ranks[1:] == in_ranks[:-1]
        assert bool((eq_ts | eq_prev).all()), \
            "permuted pair violates A'==S' or A'==A'_prev"

    pi_limbs = np.concatenate([rep[in_ranks], native_rand_limbs(
        fs, rng, blinding_factors + 1)], axis=0)
    pt_limbs = np.concatenate([rep[perm_tab_ranks], native_rand_limbs(
        fs, rng, blinding_factors + 1)], axis=0)
    pi = df.upload_canonical_u64(pi_limbs)
    pt = df.upload_canonical_u64(pt_limbs)
    return pi, pt


def native_rand_limbs(fs, rng, count: int) -> np.ndarray:
    """(count, 4) u64 canonical limbs of fs.rand draws (RNG call order
    matches the reference's per-element sampling)."""
    from ..curves.native import ints_to_limbs
    return ints_to_limbs([fs.rand(rng) for _ in range(count)])


_LOOKUP_Z_JIT: dict = {}


def lookup_commit_product(permuted: Permuted, cs: ConstraintSystem, params,
                          domain, beta: int, gamma: int, rng, transcript
                          ) -> CommittedLookup:
    """lookup/prover.rs:253-392. The grand-product scan is one fused
    jitted dispatch; commit + basis transforms are one dispatch each."""
    import jax
    df = params.scalar_df
    fs = params.curve.scalar
    n = params.n
    blinding_factors = cs.blinding_factors()

    from ..parallel import context as mesh_context
    ctx = mesh_context.active()
    if ctx is not None and n % (ctx.ndev * ctx.ndev) == 0:
        # sharded grand product, fused into ONE jitted program:
        # elementwise fractions on row-sharded arrays, shard-local
        # batched inversion, local scan + cross-shard exclusive prefix
        # (values are exact => identical bytes)
        from ..parallel.mesh import (sharded_batch_inv,
                                     sharded_inclusive_product)
        key = ("mesh", id(df), id(ctx.mesh), n)
        fn = _LOOKUP_Z_JIT.get(key)
        if fn is None:
            mesh = ctx.mesh

            def impl_mesh(pi, pt, ci, ct, b_m, g_m):
                bb = jnp.broadcast_to(b_m, (n, NLIMBS))
                gb = jnp.broadcast_to(g_m, (n, NLIMBS))
                denom = fmul(df, fadd(df, bb, pi), fadd(df, gb, pt))
                denom_inv = sharded_batch_inv(df, mesh, denom)
                product = fmul(df, denom_inv,
                               fmul(df, fadd(df, ci, bb),
                                    fadd(df, ct, gb)))
                incl = sharded_inclusive_product(df, mesh, product)
                return jnp.concatenate([df.ones((1,)), incl[:-1]], axis=0)
            fn = jax.jit(impl_mesh)
            _LOOKUP_Z_JIT[key] = fn
        z = fn(ctx.shard_rows(permuted.permuted_input),
               ctx.shard_rows(permuted.permuted_table),
               ctx.shard_rows(permuted.compressed_input),
               ctx.shard_rows(permuted.compressed_table),
               df.scalar(beta), df.scalar(gamma))
    else:
        key = (id(df), n)
        fn = _LOOKUP_Z_JIT.get(key)
        if fn is None:
            def impl(pi, pt, ci, ct, b_m, g_m):
                bb = jnp.broadcast_to(b_m, (n, NLIMBS))
                gb = jnp.broadcast_to(g_m, (n, NLIMBS))
                denom = fmul(df, fadd(df, bb, pi), fadd(df, gb, pt))
                denom_inv = batch_inv(df, denom, axis=0)
                product = fmul(df, denom_inv,
                               fmul(df, fadd(df, ci, bb),
                                    fadd(df, ct, gb)))
                incl = running_product(df, product, axis=0)
                return jnp.concatenate([df.ones((1,)), incl[:-1]], axis=0)
            fn = jax.jit(impl)
            _LOOKUP_Z_JIT[key] = fn
        z = fn(permuted.permuted_input, permuted.permuted_table,
               permuted.compressed_input, permuted.compressed_table,
               df.scalar(beta), df.scalar(gamma))

    import os
    if os.environ.get("HALO2_TPU_SANITY"):
        # telescoping (lookup/prover.rs:339-376): z[0] == 1 and the
        # product closes back to 1 at the last usable row boundary
        u = n - (blinding_factors + 1)
        ends = df.from_mont_np(np.asarray(z)[[0, u]])
        assert int(ends[0]) == 1, "lookup z[0] != 1"
        assert int(ends[1]) == 1, \
            "lookup grand product does not telescope (z[u] != 1)"

    blinds = [fs.rand(rng) for _ in range(blinding_factors)]
    z = jnp.concatenate([
        z[:n - blinding_factors],
        jnp.asarray(np.asarray(df.to_mont_np(blinds)).reshape(-1, NLIMBS))],
        axis=0)

    product_blind = fs.rand(rng)
    (commitment,) = params.commit_many([z], [product_blind], lagrange=True)
    (z_poly,), (z_coset,) = domain.lagrange_to_coeff_extended_many([z])
    transcript.write_point(commitment)
    return CommittedLookup(permuted=permuted, product_poly=z_poly,
                           product_coset=z_coset, product_blind=product_blind)


def lookup_h_terms(committed: CommittedLookup, domain, theta: int,
                   beta: int, gamma: int,
                   advice_cosets, fixed_cosets, instance_cosets,
                   l0, l_blind, l_last) -> list[jnp.ndarray]:
    """lookup/prover.rs:401-477: the 5 constraint families over the
    extended domain."""
    df = domain.df
    rot_scale = 1 << (domain.extended_k - domain.k)
    ext_n = domain.extended_n
    one = df.ones((ext_n,))
    perm = committed.permuted
    theta_m = df.scalar(theta)
    beta_m = jnp.broadcast_to(df.scalar(beta), (ext_n, NLIMBS))
    gamma_m = jnp.broadcast_to(df.scalar(gamma), (ext_n, NLIMBS))

    def coset_of(exprs):
        vals = [evaluate_expression(df, e, advice=advice_cosets,
                                    fixed=fixed_cosets,
                                    instance=instance_cosets,
                                    rot_scale=rot_scale)
                for e in exprs]
        acc = _compress(df, theta_m, vals)
        return jnp.broadcast_to(acc, (ext_n, NLIMBS))

    compressed_input_coset = coset_of(perm.input_coset_expr)
    compressed_table_coset = coset_of(perm.table_coset_expr)

    active = fsub(df, one, fadd(df, l_last, l_blind))
    z = committed.product_coset
    z_next = jnp.roll(z, -rot_scale, axis=0)
    a_prime = perm.permuted_input_coset
    s_prime = perm.permuted_table_coset
    a_prev = jnp.roll(a_prime, rot_scale, axis=0)

    out = []
    # l_0(X) * (1 - z(X))
    out.append(fmul(df, fsub(df, one, z), l0))
    # l_last(X) * (z(X)^2 - z(X))
    out.append(fmul(df, fsub(df, fmul(df, z, z), z), l_last))
    # active * (z(ωX)(a'+β)(s'+γ) - z(X)(compressed_in+β)(compressed_tab+γ))
    left = fmul(df, z_next, fmul(df, fadd(df, a_prime, beta_m),
                                 fadd(df, s_prime, gamma_m)))
    right = fmul(df, z, fmul(df, fadd(df, compressed_input_coset, beta_m),
                             fadd(df, compressed_table_coset, gamma_m)))
    out.append(fmul(df, fsub(df, left, right), active))
    # l_0(X) * (a'(X) - s'(X))
    out.append(fmul(df, fsub(df, a_prime, s_prime), l0))
    # active * (a'(X) - s'(X)) * (a'(X) - a'(ω^-1 X))
    out.append(fmul(df, fmul(df, fsub(df, a_prime, s_prime),
                             fsub(df, a_prime, a_prev)), active))
    return out


def lookup_evaluate(committed: CommittedLookup, domain, df, x: int,
                    transcript, eval_fn=None) -> dict:
    """5 evals in transcript order (lookup/prover.rs:481-510)."""
    x_inv = domain.rotate_omega(x, -1)
    x_next = domain.rotate_omega(x, 1)

    if eval_fn is not None:
        ev = eval_fn
    else:
        def ev(poly, point):
            return int(df.from_mont_np(np.asarray(
                eval_poly(df, poly, df.scalar(point)))))

    evals = {
        "product_eval": ev(committed.product_poly, x),
        "product_next_eval": ev(committed.product_poly, x_next),
        "permuted_input_eval": ev(committed.permuted.permuted_input_poly, x),
        "permuted_input_inv_eval": ev(committed.permuted.permuted_input_poly,
                                      x_inv),
        "permuted_table_eval": ev(committed.permuted.permuted_table_poly, x),
    }
    for key in ("product_eval", "product_next_eval", "permuted_input_eval",
                "permuted_input_inv_eval", "permuted_table_eval"):
        transcript.write_scalar(evals[key])
    return evals


def lookup_verifier_expressions(argument: LookupArgument, f, evals: dict,
                                advice_evals, fixed_evals, instance_evals,
                                l0: int, l_last: int, l_blind: int,
                                theta: int, beta: int, gamma: int
                                ) -> list[int]:
    """lookup/verifier.rs:94-167 on host scalars."""
    from .evaluation import evaluate_expression_host
    p = f.modulus
    active = (1 - (l_last + l_blind)) % p

    def compress(exprs):
        acc = 0
        for e in exprs:
            v = evaluate_expression_host(
                f, e, advice_evals=advice_evals, fixed_evals=fixed_evals,
                instance_evals=instance_evals)
            acc = (acc * theta + v) % p
        return acc

    z = evals["product_eval"]
    z_next = evals["product_next_eval"]
    a_prime = evals["permuted_input_eval"]
    a_prev = evals["permuted_input_inv_eval"]
    s_prime = evals["permuted_table_eval"]

    out = []
    out.append(l0 * (1 - z) % p)
    out.append(l_last * (z * z - z) % p)
    left = z_next * ((a_prime + beta) % p) % p * ((s_prime + gamma) % p) % p
    right = z * ((compress(argument.input_expressions) + beta) % p) % p \
        * ((compress(argument.table_expressions) + gamma) % p) % p
    out.append((left - right) * active % p)
    out.append(l0 * (a_prime - s_prime) % p)
    out.append((a_prime - s_prime) * (a_prime - a_prev) % p * active % p)
    return out
