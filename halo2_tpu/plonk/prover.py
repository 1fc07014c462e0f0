"""The PLONK prover: 10-phase Fiat–Shamir proof construction.

Reference: halo2_proofs/src/plonk/prover.rs:35-725 (call-stack map in
SURVEY.md §3.1). Phase order — and therefore the proof byte layout — is
reproduced exactly:
  vk.hash_into → instance commitments (common) → witness synthesis →
  advice commitments → θ → lookup permuted commitments → β, γ →
  permutation z commitments → lookup product commitments → vanishing
  random commitment → y → h(X) evaluation/commitments → x → instance /
  advice / fixed evals → vanishing eval → permutation evals → lookup
  evals → multiopen.

All O(n) work (commitments, NTTs, coset transforms, constraint-array
evaluation, scans) runs on device; the host sequences phases and hashes
the transcript.
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax.numpy as jnp

from ..fields.device import NLIMBS, fadd, fmul
from ..poly.commitment import Params, DEFAULT_BLIND
from ..poly.multiopen import ProverQuery, multiopen_create_proof
from ..poly.utils import eval_poly
from ..circuit.value import Value, SynthesisError
from ..circuit.layouter import SingleChipLayouter, Circuit
from .circuit import ConstraintSystem, Column
from .assigned import Assigned, batch_evaluate_assigned
from .keys import ProvingKey
from .keygen import NotEnoughRowsAvailable
from .evaluation import evaluate_expression, coset_points
from .permutation import (permutation_commit, permutation_h_terms,
                          permutation_evaluate, permutation_pk_evaluate)
from .lookup import (lookup_commit_permuted, lookup_commit_product,
                     lookup_h_terms, lookup_evaluate)
from .vanishing import (vanishing_commit, vanishing_construct,
                        vanishing_evaluate)


class _PhaseTimer:
    """Wall-clock per prover phase, printed when HALO2_TPU_PROF is set
    (the aux-observability analogue of the reference's TracingFloorPlanner
    span timings, SURVEY.md §5.1)."""

    def __init__(self, tag: str = "prove"):
        self.enabled = bool(os.environ.get("HALO2_TPU_PROF"))
        # HALO2_TPU_PROF_SYNC=1: drain the device queue at every lap so
        # phase times attribute async device work to the phase that
        # dispatched it (the device executes one stream in order, so a
        # fresh enqueue+readback waits for everything pending). Skews
        # total wall-clock — for attribution only.
        self.sync = bool(os.environ.get("HALO2_TPU_PROF_SYNC"))
        self.tag = tag
        self.t = time.perf_counter()

    def lap(self, name: str) -> None:
        if not self.enabled:
            return
        if self.sync:
            import numpy as _np
            import jax.numpy as _jnp
            _np.asarray(_jnp.zeros(1) + 1)
        now = time.perf_counter()
        print(f"[{self.tag}] {name}: {now - self.t:.2f}s", flush=True)
        self.t = now


class WitnessCollection:
    """Assignment sink capturing advice values (prover.rs:155-262)."""

    def __init__(self, cs: ConstraintSystem, fs, n: int, k: int,
                 instances: list[list[int]], usable_rows: int):
        self.fs = fs
        self.k = k
        self.advice: list[list[Assigned]] = [
            [Assigned.zero()] * n for _ in range(cs.num_advice_columns)]
        self.instances = instances
        self.usable_rows = usable_rows

    def enter_region(self, name):
        pass

    def exit_region(self):
        pass

    def enable_selector(self, annotation, selector, row):
        pass  # selectors are fixed by keygen

    def query_instance(self, column: Column, row: int) -> Value:
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        col = self.instances[column.index]
        v = col[row] if row < len(col) else 0
        return Value.known(v)

    def assign_advice(self, annotation, column: Column, row: int, to):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        v = to()
        v = v if isinstance(v, Value) else Value.known(v)
        if v.is_known():
            inner = v.inner()
            self.advice[column.index][row] = (
                inner if isinstance(inner, Assigned)
                else Assigned.trivial(inner % self.fs.modulus))

    def assign_fixed(self, annotation, column, row, to):
        pass  # fixed by keygen

    def copy(self, *args):
        pass

    def fill_from_row(self, *args):
        pass

    # ---- batch synthesis extension (Layouter.assign_regions) ----
    def assign_advice_batch(self, annotation, column: Column,
                            rows: list[int], values: list) -> None:
        if rows and max(rows) >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        col = self.advice[column.index]
        p = self.fs.modulus
        for r, v in zip(rows, values):
            if isinstance(v, Value):
                if not v.is_known():
                    continue
                v = v.inner()
            col[r] = (v if isinstance(v, Assigned)
                      else Assigned.trivial(v % p))

    def assign_fixed_batch(self, annotation, column, rows, values):
        pass  # fixed by keygen

    def enable_selector_batch(self, annotation, selector, rows):
        pass  # selectors are fixed by keygen

    def copy_batch(self, col_a, rows_a, col_b, rows_b):
        pass

    def push_namespace(self, name):
        pass

    def pop_namespace(self, gadget_name=None):
        pass


# Max expression-AST nodes fused into one jitted h-chunk program; 0
# disables chunking (the eager per-op path). Fusing would cut Table16's
# ~6,500 per-instance gate-eval dispatches (71 s of the 94 s warm k=17
# prove) to dozens, but on the attached runtime every compiled
# executable occupies device memory on load and the chunk fleet
# exhausts HBM at k=17 at every chunk size tried (400/96/32/8 nodes —
# the failure is cumulative executable loads, not per-chunk
# intermediates). Default off; enable on runtimes with cheap
# executables via HALO2_TPU_H_CHUNK_NODES.
H_CHUNK_NODES = int(os.environ.get("HALO2_TPU_H_CHUNK_NODES", "0"))


def _expr_nodes(e) -> int:
    return e.evaluate(
        constant=lambda v: 1, selector_fn=lambda s: 1,
        fixed_fn=lambda q: 1, advice_fn=lambda q: 1,
        instance_fn=lambda q: 1, negated=lambda a: a + 1,
        sum_fn=lambda a, b: a + b + 1, product=lambda a, b: a + b + 1,
        scaled=lambda a, v: a + 1)


def _gates_h_fold(pk, cs, df, rot_scale: int, ext_n: int, y: int, y_m,
                  h_acc, advice_c, fixed_c, instance_c):
    """Fold every gate polynomial into the quotient accumulator with
    chunked jitted programs: chunk fold = h·y^k + Σ t_i·y^{k-i} (the
    same Horner order as term-by-term folding). Compiled chunks are
    cached on the pk and reused across circuit instances and proofs."""
    import jax
    if H_CHUNK_NODES <= 0:
        # eager path: one dispatch per DISTINCT expression node — the
        # use-counted memo hash-conses repeated subtrees and column
        # queries across the whole gate set (Table16: 6,559 nodes ->
        # 931 distinct) while freeing each shared value after its last
        # use so peak device memory stays bounded
        from .evaluation import expression_share_counts, fresh_memo
        tmpl = getattr(pk, "_h_share_counts", None)
        if tmpl is None:
            tmpl = pk._h_share_counts = expression_share_counts(
                [e for g in cs.gates for e in g.polys])
        memo = fresh_memo(tmpl)
        for gate in cs.gates:
            for expr in gate.polys:
                t = evaluate_expression(
                    df, expr, advice=advice_c, fixed=fixed_c,
                    instance=instance_c, rot_scale=rot_scale, memo=memo)
                if h_acc is None:
                    h_acc = t
                else:
                    h_acc = fadd(df, fmul(df, h_acc, jnp.broadcast_to(
                        y_m, h_acc.shape)), t)
        return h_acc
    chunks = getattr(pk, "_h_gate_chunks", None)
    if chunks is None:
        exprs = [e for gate in cs.gates for e in gate.polys]
        chunks = []
        cur, cur_nodes = [], 0
        for e in exprs:
            nn = _expr_nodes(e)
            if cur and cur_nodes + nn > H_CHUNK_NODES:
                chunks.append(cur)
                cur, cur_nodes = [], 0
            cur.append(e)
            cur_nodes += nn
        if cur:
            chunks.append(cur)
        pk._h_gate_chunks = chunks
        pk._h_chunk_fns = [None] * len(chunks)
    if not chunks:
        return h_acc

    p = df.spec.modulus
    for ci, chunk in enumerate(chunks):
        fn = pk._h_chunk_fns[ci]
        if fn is None:
            def make(chunk=chunk):
                from .evaluation import (expression_share_counts,
                                         fresh_memo)
                tmpl = expression_share_counts(chunk)

                def impl(h_prev, ym, ykm, adv, fxd, inst):
                    # hash-cons INSIDE the trace too: repeated subtrees
                    # (column/rotation queries above all) emit one op
                    # each, keeping the traced graph at the distinct-
                    # node count (Table16: 6,559 -> 931) so a whole-
                    # gate-set chunk stays compilable
                    memo = fresh_memo(tmpl)
                    local = None
                    for e in chunk:
                        t = evaluate_expression(
                            df, e, advice=list(adv), fixed=list(fxd),
                            instance=list(inst), rot_scale=rot_scale,
                            memo=memo)
                        if local is None:
                            local = t
                        else:
                            local = fadd(
                                df, fmul(df, local, jnp.broadcast_to(
                                    ym, local.shape)), t)
                    local = jnp.broadcast_to(local, (ext_n, NLIMBS))
                    return fadd(df, fmul(df, h_prev, jnp.broadcast_to(
                        ykm, h_prev.shape)), local)
                # donate the accumulator: its 64 MB buffer at k=17 is
                # dead after the fold
                return jax.jit(impl, donate_argnums=(0,))
            fn = pk._h_chunk_fns[ci] = make()
        yk_m = df.scalar(pow(y, len(chunk), p))
        if h_acc is None:
            h_acc = df.zeros((ext_n,))
        h_acc = fn(h_acc, y_m, yk_m, tuple(advice_c), tuple(fixed_c),
                   tuple(instance_c))
    return h_acc


def create_proof(params: Params, pk: ProvingKey, circuits: list[Circuit],
                 instances: list[list[list[int]]], rng, transcript) -> None:
    """prover.rs:35-725. `instances[i][j]` is the j-th instance column for
    the i-th circuit instance."""
    if len(circuits) != len(instances):
        raise ValueError("circuits/instances length mismatch")
    cs = pk.vk.cs
    fs = params.curve.scalar
    df = params.scalar_df
    domain = pk.vk.domain
    n = params.n

    prof = _PhaseTimer()
    pk.vk.hash_into(transcript)

    # ---- mesh mode: row-shard the pk's device arrays once so every
    # elementwise phase (gate eval, h fold, vanishing division) runs
    # SPMD over the mesh; commits/NTTs/scans take their sharded paths
    # inside Params/EvaluationDomain/lookup/permutation ----
    from ..parallel import context as mesh_context
    _mesh = mesh_context.active()
    _mshard = (lambda a: a) if _mesh is None else _mesh.shard_rows
    if _mesh is not None and getattr(pk, "_mesh_ndev", None) != _mesh.ndev:
        pk.fixed_values = [_mshard(a) for a in pk.fixed_values]
        pk.fixed_polys = [_mshard(a) for a in pk.fixed_polys]
        pk.fixed_cosets = [_mshard(a) for a in pk.fixed_cosets]
        pk.l0 = _mshard(pk.l0)
        pk.l_blind = _mshard(pk.l_blind)
        pk.l_last = _mshard(pk.l_last)
        pk.permutation.permutations = [
            _mshard(a) for a in pk.permutation.permutations]
        pk.permutation.polys = [_mshard(a) for a in pk.permutation.polys]
        pk.permutation.cosets = [_mshard(a) for a in pk.permutation.cosets]
        pk._mesh_ndev = _mesh.ndev

    # ---- instance commitments (common inputs) + polys + cosets ----
    instance_singles = []
    for inst in instances:
        if len(inst) != cs.num_instance_columns:
            raise ValueError("wrong number of instance columns")
        values_l = []
        for values in inst:
            if len(values) > n - (cs.blinding_factors() + 1):
                raise ValueError("InstanceTooLarge")
            padded = list(values) + [0] * (n - len(values))
            values_l.append(_mshard(df.upload_values(padded)))
        commitments = params.commit_many(
            values_l, [DEFAULT_BLIND] * len(values_l), lagrange=True)
        polys_l, cosets_l = domain.lagrange_to_coeff_extended_many(values_l)
        for c in commitments:
            transcript.common_point(c)
        instance_singles.append(
            {"values": values_l, "polys": polys_l, "cosets": cosets_l})

    prof.lap("instance commit+ntt")

    # ---- witness synthesis + advice commitments ----
    unusable_rows_start = n - (cs.blinding_factors() + 1)
    advice_singles = []
    for circuit, inst in zip(circuits, instances):
        witness_cs = ConstraintSystem()
        config = type(circuit).configure(witness_cs)
        witness = WitnessCollection(witness_cs, fs, n, params.k, inst,
                                    unusable_rows_start)
        from ..circuit import synthesize_circuit
        # Floor-plan layout is cached on the pk: repeat proofs (and the
        # 2nd+ circuit instance of this proof) skip the measurement pass.
        plan_cache = getattr(pk, "_synth_plan", None)
        if plan_cache is None:
            plan_cache = pk._synth_plan = {}
        synthesize_circuit(witness, circuit, config, witness_cs.constants,
                           plan_cache=plan_cache)
        prof.lap("advice: synthesis")

        advice_cols = []
        for col in witness.advice:
            ints = batch_evaluate_assigned(fs, col)
            # blinding rows
            for row in range(unusable_rows_start, n):
                ints[row] = fs.rand(rng)
            advice_cols.append(_mshard(df.upload_values(ints)))
        advice_blinds = [fs.rand(rng) for _ in advice_cols]
        prof.lap("advice: eval+pack")
        for pt in params.commit_many(advice_cols, advice_blinds,
                                     lagrange=True):
            transcript.write_point(pt)
        prof.lap("advice: commit")
        polys, cosets = domain.lagrange_to_coeff_extended_many(advice_cols)
        advice_singles.append({"values": advice_cols, "polys": polys,
                               "cosets": cosets, "blinds": advice_blinds})

    prof.lap("advice: ntt+extend")
    theta = transcript.squeeze_challenge()

    # ---- lookups: commit permuted ----
    lookups_permuted = []
    for inst_s, adv_s in zip(instance_singles, advice_singles):
        per_instance = []
        for argument in cs.lookups:
            per_instance.append(lookup_commit_permuted(
                argument, cs, params, domain, theta,
                adv_s["values"], pk.fixed_values, inst_s["values"],
                rng, transcript))
        lookups_permuted.append(per_instance)

    prof.lap("lookup permuted")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # ---- permutation z commitments ----
    permutations_committed = []
    for inst_s, adv_s in zip(instance_singles, advice_singles):
        permutations_committed.append(permutation_commit(
            cs, params, domain, pk.permutation,
            adv_s["values"], pk.fixed_values, inst_s["values"],
            beta, gamma, rng, transcript))

    prof.lap("permutation z")
    # ---- lookup product commitments ----
    lookups_committed = []
    for per_instance in lookups_permuted:
        lk = []
        for permuted in per_instance:
            lk.append(lookup_commit_product(
                permuted, cs, params, domain, beta, gamma, rng, transcript))
        lookups_committed.append(lk)

    prof.lap("lookup products")
    # ---- vanishing: random poly ----
    vanishing = vanishing_commit(params, domain, rng, transcript)

    prof.lap("vanishing random")
    y = transcript.squeeze_challenge()

    # ---- h(X): streamed y-fold of the constraint terms ----
    # The fold acc = acc*y + term runs as terms are produced instead of
    # materializing every (extended_n, 16) term first (the reference's
    # evaluator folds incrementally per chunk, poly/evaluator.rs:210-227;
    # dozens of Table16 gate polys at k=17 would otherwise hold ~64 MB
    # each of live device memory). Same Horner order => identical bytes.
    coset_pts = coset_points(domain)
    rot_scale = 1 << (domain.extended_k - domain.k)
    ext_n = domain.extended_n
    y_m = df.scalar(y)
    h_acc = None

    def h_fold(term):
        nonlocal h_acc
        if h_acc is None:
            h_acc = term
        else:
            h_acc = fadd(df, fmul(df, h_acc,
                                  jnp.broadcast_to(y_m, h_acc.shape)), term)

    for inst_s, adv_s, perm_sets, lk_committed in zip(
            instance_singles, advice_singles, permutations_committed,
            lookups_committed):
        # gate constraints: chunk-jitted fused evaluation — evaluating
        # each expression node as its own eager dispatch cost ~6,500
        # device round-trips per Table16 instance (71 s of the 94 s
        # warm k=17 prove); fused chunks collapse that to ~16 dispatches
        h_acc = _gates_h_fold(pk, cs, df, rot_scale, ext_n, y, y_m,
                              h_acc, adv_s["cosets"], pk.fixed_cosets,
                              inst_s["cosets"])
        # permutation constraints
        for term in permutation_h_terms(
                cs, domain, pk.permutation, perm_sets,
                adv_s["cosets"], pk.fixed_cosets, inst_s["cosets"],
                pk.l0, pk.l_blind, pk.l_last, coset_pts, beta, gamma):
            h_fold(term)
        # lookup constraints
        for committed in lk_committed:
            for term in lookup_h_terms(
                    committed, domain, theta, beta, gamma,
                    adv_s["cosets"], pk.fixed_cosets, inst_s["cosets"],
                    pk.l0, pk.l_blind, pk.l_last):
                h_fold(term)

    h_terms = ([] if h_acc is None
               else [jnp.broadcast_to(h_acc, (ext_n, NLIMBS))])

    prof.lap("h terms build")
    constructed = vanishing_construct(vanishing, params, domain, h_terms, y,
                                      rng, transcript)

    prof.lap("vanishing construct (h commit)")
    x = transcript.squeeze_challenge()
    xn = pow(x, n, fs.modulus)

    # ---- ALL scalar opens between the x and x1 squeezes are computed
    # in ONE batched device dispatch (poly/utils.py::MemoEval): each
    # individual eval is pure round-trip latency on a tunneled device.
    from ..poly.utils import MemoEval
    memo = MemoEval(df)
    for inst_s in instance_singles:
        for column, at in cs.instance_queries:
            memo.collect(inst_s["polys"][column.index],
                         domain.rotate_omega(x, at.value))
    for adv_s in advice_singles:
        for column, at in cs.advice_queries:
            memo.collect(adv_s["polys"][column.index],
                         domain.rotate_omega(x, at.value))
    for column, at in cs.fixed_queries:
        memo.collect(pk.fixed_polys[column.index],
                     domain.rotate_omega(x, at.value))
    _x_next = domain.rotate_omega(x, 1)
    _x_inv = domain.rotate_omega(x, -1)
    _x_last = domain.rotate_omega(x, -(cs.blinding_factors() + 1))
    for poly in pk.permutation.polys:
        memo.collect(poly, x)
    for perm_sets in permutations_committed:
        for i, s in enumerate(perm_sets):
            memo.collect(s.z_poly, x)
            memo.collect(s.z_poly, _x_next)
            if i < len(perm_sets) - 1:
                memo.collect(s.z_poly, _x_last)
    for lk_committed in lookups_committed:
        for committed in lk_committed:
            memo.collect(committed.product_poly, x)
            memo.collect(committed.product_poly, _x_next)
            memo.collect(committed.permuted.permuted_input_poly, x)
            memo.collect(committed.permuted.permuted_input_poly, _x_inv)
            memo.collect(committed.permuted.permuted_table_poly, x)
    memo.collect(vanishing.random_poly, x)
    memo.compute()
    ev = memo.ev

    # instance evals
    for inst_s in instance_singles:
        for column, at in cs.instance_queries:
            transcript.write_scalar(
                ev(inst_s["polys"][column.index],
                   domain.rotate_omega(x, at.value)))
    # advice evals
    for adv_s in advice_singles:
        for column, at in cs.advice_queries:
            transcript.write_scalar(
                ev(adv_s["polys"][column.index],
                   domain.rotate_omega(x, at.value)))
    # fixed evals
    for column, at in cs.fixed_queries:
        transcript.write_scalar(
            ev(pk.fixed_polys[column.index],
               domain.rotate_omega(x, at.value)))

    prof.lap("instance/advice/fixed evals")
    h_poly, h_blind = vanishing_evaluate(constructed, params, x, xn,
                                         transcript, eval_fn=ev)

    permutation_pk_evaluate(pk.permutation, df, x, transcript,
                            eval_fn=ev)
    for perm_sets in permutations_committed:
        permutation_evaluate(perm_sets, domain, cs, x, df, transcript,
                             eval_fn=ev)
    for lk_committed in lookups_committed:
        for committed in lk_committed:
            lookup_evaluate(committed, domain, df, x, transcript,
                            eval_fn=ev)

    prof.lap("vanishing+perm+lookup evals")
    # ---- multiopen queries (prover.rs:676-724) ----
    queries: list[ProverQuery] = []
    blinding_factors = cs.blinding_factors()
    x_next = domain.rotate_omega(x, 1)
    x_inv = domain.rotate_omega(x, -1)
    x_last = domain.rotate_omega(x, -(blinding_factors + 1))

    for inst_s, adv_s, perm_sets, lk_committed in zip(
            instance_singles, advice_singles, permutations_committed,
            lookups_committed):
        for column, at in cs.instance_queries:
            queries.append(ProverQuery(
                point=domain.rotate_omega(x, at.value),
                poly=inst_s["polys"][column.index], blind=DEFAULT_BLIND))
        for column, at in cs.advice_queries:
            queries.append(ProverQuery(
                point=domain.rotate_omega(x, at.value),
                poly=adv_s["polys"][column.index],
                blind=adv_s["blinds"][column.index]))
        # permutation opens (permutation/prover.rs:386-420)
        for s in perm_sets:
            queries.append(ProverQuery(point=x, poly=s.z_poly,
                                       blind=s.blind))
            queries.append(ProverQuery(point=x_next, poly=s.z_poly,
                                       blind=s.blind))
        for s in list(reversed(perm_sets))[1:]:
            queries.append(ProverQuery(point=x_last, poly=s.z_poly,
                                       blind=s.blind))
        # lookup opens (lookup/prover.rs:513-552)
        for committed in lk_committed:
            queries.append(ProverQuery(
                point=x, poly=committed.product_poly,
                blind=committed.product_blind))
            queries.append(ProverQuery(
                point=x, poly=committed.permuted.permuted_input_poly,
                blind=committed.permuted.permuted_input_blind))
            queries.append(ProverQuery(
                point=x, poly=committed.permuted.permuted_table_poly,
                blind=committed.permuted.permuted_table_blind))
            queries.append(ProverQuery(
                point=x_inv, poly=committed.permuted.permuted_input_poly,
                blind=committed.permuted.permuted_input_blind))
            queries.append(ProverQuery(
                point=x_next, poly=committed.product_poly,
                blind=committed.product_blind))

    for column, at in cs.fixed_queries:
        queries.append(ProverQuery(
            point=domain.rotate_omega(x, at.value),
            poly=pk.fixed_polys[column.index], blind=DEFAULT_BLIND))
    for poly in pk.permutation.polys:
        queries.append(ProverQuery(point=x, poly=poly, blind=DEFAULT_BLIND))
    # vanishing opens: h at x, random at x (vanishing/prover.rs:155-172)
    queries.append(ProverQuery(point=x, poly=h_poly, blind=h_blind))
    queries.append(ProverQuery(point=x, poly=vanishing.random_poly,
                               blind=vanishing.random_blind))

    multiopen_create_proof(params, rng, transcript, queries)
    prof.lap("multiopen+ipa")
