"""Key generation: keygen_vk / keygen_pk.

Reference: halo2_proofs/src/plonk/keygen.rs —
  create_domain (:25-44), Assembly assignment sink recording fixed cells /
  selectors / copies with usable_rows enforcement (:46-186),
  keygen_vk (:189-244), keygen_pk (:247-337: fixed coeff+coset forms,
  permutation pk, l0/l_blind/l_last indicator polys in extended basis).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields.device import NLIMBS
from ..poly.domain import EvaluationDomain
from ..poly.commitment import Params, DEFAULT_BLIND
from ..circuit.value import Value, SynthesisError
from ..circuit.layouter import SingleChipLayouter, Circuit
from .circuit import ConstraintSystem, Column, Selector, FIXED
from .assigned import Assigned, batch_evaluate_assigned
from .compress_selectors import compress_selectors
from .permutation import PermutationAssembly, build_vk, build_pk
from .keys import VerifyingKey, ProvingKey


from .error import NotEnoughRowsAvailable  # noqa: F401 (re-export)


def create_domain(params: Params, circuit_cls) -> tuple[
        ConstraintSystem, EvaluationDomain, object]:
    cs = ConstraintSystem()
    config = circuit_cls.configure(cs)
    degree = cs.degree()
    domain = EvaluationDomain(params.scalar_df, degree, params.k)
    return cs, domain, config


class Assembly:
    """keygen Assignment sink (keygen.rs:46-186)."""

    def __init__(self, cs: ConstraintSystem, params: Params, fs):
        self.fs = fs
        n = params.n
        self.k = params.k
        self.fixed: list[list[Assigned]] = [
            [Assigned.zero()] * n for _ in range(cs.num_fixed_columns)]
        self.permutation = PermutationAssembly(n, cs.permutation)
        self.selectors: list[list[bool]] = [
            [False] * n for _ in range(cs.num_selectors)]
        self.usable_rows = n - (cs.blinding_factors() + 1)

    # ---- Assignment interface ----
    def enter_region(self, name):
        pass

    def exit_region(self):
        pass

    def enable_selector(self, annotation, selector: Selector, row: int):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        self.selectors[selector.index][row] = True

    def query_instance(self, column, row: int) -> Value:
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        return Value.unknown()

    def assign_advice(self, annotation, column, row, to):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        # advice is ignored during keygen (but the closure may raise)

    def assign_fixed(self, annotation, column: Column, row: int, to):
        if row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        v = to()
        v = v if isinstance(v, Value) else Value.known(v)
        if v.is_known():
            inner = v.inner()
            self.fixed[column.index][row] = (
                inner if isinstance(inner, Assigned)
                else Assigned.trivial(inner % self.fs.modulus))

    def copy(self, left_column, left_row, right_column, right_row):
        if left_row >= self.usable_rows or right_row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        self.permutation.copy(left_column, left_row, right_column, right_row)

    def fill_from_row(self, column: Column, from_row: int, value: Value):
        if from_row >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        inner = value.inner() if isinstance(value, Value) else value
        if inner is None:
            raise SynthesisError("table default value unknown")
        filler = (inner if isinstance(inner, Assigned)
                  else Assigned.trivial(inner % self.fs.modulus))
        col = self.fixed[column.index]
        for row in range(from_row, self.usable_rows):
            col[row] = filler

    def push_namespace(self, name):
        pass

    def pop_namespace(self, gadget_name=None):
        pass

    # ---- batch synthesis extension (Layouter.assign_regions) ----
    def assign_advice_batch(self, annotation, column, rows, values):
        if rows and max(rows) >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        # advice is ignored during keygen

    def assign_fixed_batch(self, annotation, column: Column,
                           rows: list[int], values: list) -> None:
        if rows and max(rows) >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        col = self.fixed[column.index]
        p = self.fs.modulus
        for r, v in zip(rows, values):
            if isinstance(v, Value):
                if not v.is_known():
                    continue
                v = v.inner()
            col[r] = (v if isinstance(v, Assigned)
                      else Assigned.trivial(v % p))

    def enable_selector_batch(self, annotation, selector: Selector,
                              rows: list[int]) -> None:
        if rows and max(rows) >= self.usable_rows:
            raise NotEnoughRowsAvailable(self.k)
        col = self.selectors[selector.index]
        for r in rows:
            col[r] = True

    def copy_batch(self, col_a, rows_a, col_b, rows_b) -> None:
        if ((rows_a and max(rows_a) >= self.usable_rows)
                or (rows_b and max(rows_b) >= self.usable_rows)):
            raise NotEnoughRowsAvailable(self.k)
        for ra, rb in zip(rows_a, rows_b):
            self.permutation.copy(col_a, ra, col_b, rb)


def _synthesize(circuit: Circuit, config, assembly, constants):
    from ..circuit import synthesize_circuit
    synthesize_circuit(assembly, circuit, config, constants)


def _witness_free(circuit: Circuit) -> Circuit:
    """circuit.without_witnesses(), propagating the dev.tfp tracing
    marker so keygen synthesis is traced too."""
    wf = circuit.without_witnesses()
    events = getattr(circuit, "_tfp_events", None)
    if events is not None:
        wf._tfp_events = events
    return wf



def keygen_vk(params: Params, circuit: Circuit) -> VerifyingKey:
    """keygen.rs:189-244."""
    from .prover import _PhaseTimer
    prof = _PhaseTimer(tag="keygen_vk")
    fs = params.curve.scalar
    df = params.scalar_df
    cs, domain, config = create_domain(params, type(circuit))
    if params.n < cs.minimum_rows():
        raise NotEnoughRowsAvailable(params.k)
    prof.lap("domain")

    assembly = Assembly(cs, params, fs)
    _synthesize(_witness_free(circuit), config, assembly, cs.constants)
    prof.lap("synthesize")

    cs, selector_polys = compress_selectors(cs, assembly.selectors)
    fixed_ints = [batch_evaluate_assigned(fs, col) for col in assembly.fixed]
    fixed_ints.extend([v % fs.modulus for v in poly]
                      for poly in selector_polys)
    prof.lap("compress+evaluate")

    permutation_vk = build_vk(params, domain, assembly.permutation)
    prof.lap("permutation build_vk")

    # Fixed columns originate on the host, so commit straight from host
    # ints via the native multi-MSM (no upload, no device executable
    # load); device commit_many is the fallback.
    fixed_commitments = []
    if fixed_ints:
        import os as _os
        from ..curves import native
        if (not _os.environ.get("HALO2_TPU_NO_NATIVE")
                and native._load() is not None):
            fixed_commitments = params.commit_native_many(
                np.stack([native.ints_to_limbs(col) for col in fixed_ints]),
                [DEFAULT_BLIND] * len(fixed_ints), lagrange=True,
                mont=False)
        if not fixed_commitments:
            fixed_device = [df.upload_values(col) for col in fixed_ints]
            fixed_commitments = params.commit_many(
                fixed_device, [DEFAULT_BLIND] * len(fixed_device),
                lagrange=True)
    prof.lap("fixed commits")
    vk = VerifyingKey(
        curve=params.curve, domain=domain,
        fixed_commitments=fixed_commitments,
        permutation_commitments=permutation_vk,
        cs=cs, cs_degree=cs.degree(), selectors=assembly.selectors)
    # Memo for keygen_pk: synthesis of the SAME circuit object yields an
    # identical assembly (fixed cells / selectors / copies), so pk
    # generation can skip the second synthesis pass entirely.
    vk._keygen_memo = (circuit, assembly, fixed_ints)
    return vk


def keygen_pk(params: Params, vk: VerifyingKey,
              circuit: Circuit) -> ProvingKey:
    """keygen.rs:247-337 (re-synthesizes with a fresh ConstraintSystem so
    queries/columns match the vk's post-compression layout)."""
    fs = params.curve.scalar
    df = params.scalar_df
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)
    domain = vk.domain
    if params.n < cs.minimum_rows():
        raise NotEnoughRowsAvailable(params.k)

    from .prover import _PhaseTimer
    prof = _PhaseTimer(tag="keygen_pk")
    memo = getattr(vk, "_keygen_memo", None)
    if memo is not None and memo[0] is circuit:
        # keygen_vk synthesized this exact circuit object: its assembly
        # (fixed cells / selectors / copies) and evaluated fixed columns
        # are identical, so skip the second synthesis pass.
        assembly, fixed_ints = memo[1], memo[2]
        cs, _ = compress_selectors(cs, assembly.selectors)
        prof.lap("synthesize (memoized)")
    else:
        assembly = Assembly(cs, params, fs)
        _synthesize(_witness_free(circuit), config, assembly,
                    cs.constants)
        prof.lap("synthesize")
        cs, selector_polys = compress_selectors(cs, assembly.selectors)
        fixed_ints = [batch_evaluate_assigned(fs, col)
                      for col in assembly.fixed]
        fixed_ints.extend([v % fs.modulus for v in poly]
                          for poly in selector_polys)
        prof.lap("compress+evaluate")

    n = params.n
    blinding_factors = cs.blinding_factors()

    # Host-origin pipeline when the native library is available: build
    # Montgomery limb arrays on the host, run the native NTTs, and
    # upload only the results — zero device readbacks (a fresh-process
    # readback can stall minutes on the tunneled backend).
    import os as _os
    from ..curves import native
    host_cols = None
    if (not _os.environ.get("HALO2_TPU_NO_NATIVE")
            and native._load() is not None):
        idx = native.field_idx(fs)
        if idx is not None:
            host_cols = []
            for col in fixed_ints:
                arr = native.ints_to_limbs(col).copy()
                native.raw_to_mont_inplace(idx, arr, fs.modulus)
                host_cols.append(arr)

    def indicator_host(rows: list[int]) -> np.ndarray:
        arr = np.zeros((n, 4), np.uint64)
        one_m = np.frombuffer(
            int(pow(2, 256, fs.modulus)).to_bytes(32, "little"), np.uint64)
        arr[rows] = one_m
        return arr

    if host_cols is not None:
        fixed_values = [df.upload_mont(c) for c in host_cols]
        fixed_polys, fixed_cosets = (
            domain.lagrange_to_coeff_extended_many_host(host_cols)
            if host_cols else ([], []))
        prof.lap("fixed ntt (host)")
        permutation_pk = build_pk(params, domain, assembly.permutation)
        prof.lap("permutation build_pk")
        _, (l0, l_blind, l_last) = (
            domain.lagrange_to_coeff_extended_many_host([
                indicator_host([0]),
                indicator_host(list(range(n - blinding_factors, n))),
                indicator_host([n - blinding_factors - 1])]))
    else:
        fixed_values = [df.upload_values(col) for col in fixed_ints]
        prof.lap("pack")
        fixed_polys, fixed_cosets = domain.lagrange_to_coeff_extended_many(
            fixed_values)
        prof.lap("fixed ntt")
        permutation_pk = build_pk(params, domain, assembly.permutation)
        prof.lap("permutation build_pk")

        def indicator_lag(rows: list[int]) -> jnp.ndarray:
            vals = [0] * n
            for r in rows:
                vals[r] = 1
            return df.upload_values(vals)

        _, (l0, l_blind, l_last) = domain.lagrange_to_coeff_extended_many([
            indicator_lag([0]),
            indicator_lag(list(range(n - blinding_factors, n))),
            indicator_lag([n - blinding_factors - 1])])

    return ProvingKey(
        vk=vk, l0=l0, l_blind=l_blind, l_last=l_last,
        l_active_row_info=(blinding_factors,),
        fixed_values=fixed_values, fixed_polys=fixed_polys,
        fixed_cosets=fixed_cosets, permutation=permutation_pk)
