"""Byte-level parity with the reference's plonk_api test.

Mirrors the standard-PLONK circuit of halo2_proofs/tests/plonk_api.rs
(same configure order, same assignments) and checks against two golden
artifacts extracted verbatim from the reference test suite:

  tests/golden/pinned_vk_plonk_api.txt
      the expected `{:#?}` pinned-vk text (plonk_api.rs:589-957)
  tests/golden/plonk_api_proof.bin
      the reference's hardcoded proof over Params<EqAffine>, K=5
      (plonk_api.rs:461-476), containing TWO circuit instances

Passing means the whole stack is byte-compatible with the reference:
Vesta SRS generation (hash_to_curve), circuit IR query/column ordering,
the SimpleFloorPlanner layout, keygen (fixed + permutation commitments),
the Rust-Debug pinned text / transcript_repr, the Blake2b transcript,
and the verifier's full read/challenge schedule.
"""
import os

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import VESTA
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.poly import Params
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import (keygen_vk, keygen_pk, verify_proof,
                             SingleVerifier)

K = 5
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


class PlonkApiCircuit(Circuit):
    """plonk_api.rs MyCircuit: the standard-PLONK gate a*sa + b*sb +
    a*b*sm - c*sc + sf*(d_next * e_prev), a public-input gate, a
    single-column lookup, and heavy equality constraints."""

    def __init__(self, a=None, lookup_table=()):
        self.a = a
        self.lookup_table = list(lookup_table)

    def without_witnesses(self):
        return PlonkApiCircuit(None, self.lookup_table)

    @classmethod
    def configure(cls, meta):
        # Column creation + enable_equality order is significant: it
        # fixes column indices, query indices, and the permutation
        # column list (plonk_api.rs:276-345).
        e = meta.advice_column()
        a = meta.advice_column()
        b = meta.advice_column()
        sf = meta.fixed_column()
        c = meta.advice_column()
        d = meta.advice_column()
        p = meta.instance_column()

        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)

        sm = meta.fixed_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()
        sp = meta.fixed_column()
        sl = meta.lookup_table_column()

        meta.lookup("", lambda cells: [(cells.query_any(a, Rotation(0)),
                                        sl)])

        def combined_add_mult(cells):
            d_n = cells.query_advice(d, Rotation(1))
            a_ = cells.query_advice(a, Rotation(0))
            sf_ = cells.query_fixed(sf)
            e_p = cells.query_advice(e, Rotation(-1))
            b_ = cells.query_advice(b, Rotation(0))
            c_ = cells.query_advice(c, Rotation(0))
            sa_ = cells.query_fixed(sa)
            sb_ = cells.query_fixed(sb)
            sc_ = cells.query_fixed(sc)
            sm_ = cells.query_fixed(sm)
            return [a_ * sa_ + b_ * sb_ + a_ * b_ * sm_ - (c_ * sc_)
                    + sf_ * (d_n * e_p)]

        meta.create_gate("Combined add-mult", combined_add_mult)

        def public_input(cells):
            a_ = cells.query_advice(a, Rotation(0))
            p_ = cells.query_instance(p, Rotation(0))
            sp_ = cells.query_fixed(sp)
            return [sp_ * (a_ - p_)]

        meta.create_gate("Public input", public_input)

        meta.enable_equality(sf)
        meta.enable_equality(e)
        meta.enable_equality(d)
        meta.enable_equality(p)
        meta.enable_equality(sm)
        meta.enable_equality(sa)
        meta.enable_equality(sb)
        meta.enable_equality(sc)
        meta.enable_equality(sp)

        return {"a": a, "b": b, "c": c, "d": d, "e": e, "sa": sa,
                "sb": sb, "sc": sc, "sm": sm, "sp": sp, "sf": sf,
                "sl": sl}

    # ---- StandardCs helpers (plonk_api.rs:96-260) ----
    def _raw(self, cfg, layouter, name, v0, v1, v2, sa, sb, sc, sm):
        fs = FP

        def val(x):
            return (lambda: Value.known(x)) if x is not None else \
                (lambda: Value.unknown())

        def pow4(x):
            return fs.mul(fs.mul(x, x), fs.mul(x, x)) if x is not None \
                else None

        def region_fn(region):
            lhs = region.assign_advice("lhs", cfg["a"], 0, val(v0))
            region.assign_advice("lhs^4", cfg["d"], 0, val(pow4(v0)))
            rhs = region.assign_advice("rhs", cfg["b"], 0, val(v1))
            region.assign_advice("rhs^4", cfg["e"], 0, val(pow4(v1)))
            out = region.assign_advice("out", cfg["c"], 0, val(v2))
            region.assign_fixed("a", cfg["sa"], 0,
                                lambda: Value.known(sa))
            region.assign_fixed("b", cfg["sb"], 0,
                                lambda: Value.known(sb))
            region.assign_fixed("c", cfg["sc"], 0,
                                lambda: Value.known(sc))
            region.assign_fixed("a * b", cfg["sm"], 0,
                                lambda: Value.known(sm))
            return lhs.cell, rhs.cell, out.cell

        return layouter.assign_region(name, region_fn)

    def synthesize(self, config, layouter):
        fs = FP

        def public_input_region(region):
            v = region.assign_advice("value", config["a"], 0,
                                     lambda: Value.known(2))
            region.assign_fixed("public", config["sp"], 0,
                                lambda: Value.known(1))
            return v.cell

        layouter.assign_region("public_input", public_input_region)

        a = self.a
        asq = fs.mul(a, a) if a is not None else None
        fin = (asq + a) % fs.modulus if a is not None else None
        for _ in range(10):
            a0, _, c0 = self._raw(config, layouter, "raw_multiply",
                                  a, a, asq, 0, 0, 1, 1)
            a1, b1, _ = self._raw(config, layouter, "raw_add",
                                  a, asq, fin, 1, 1, 1, 0)
            layouter.assign_region(
                "copy", lambda region, l=a0, r=a1:
                (region.constrain_equal(l, r),
                 region.constrain_equal(l, r)))
            layouter.assign_region(
                "copy", lambda region, l=b1, r=c0:
                (region.constrain_equal(l, r),
                 region.constrain_equal(l, r)))

        def table_fn(table):
            for i, v in enumerate(self.lookup_table):
                table.assign_cell("table col", config["sl"], i,
                                  lambda v=v: Value.known(v))

        layouter.assign_table("", table_fn)


@pytest.fixture(scope="module")
def artifacts():
    params = Params.new(VESTA, K, use_cache=False)
    a = 2834758237 * FP.zeta % FP.modulus
    instance = 2
    lookup_table = [instance, a, a, 0]
    empty = PlonkApiCircuit(None, lookup_table)
    vk = keygen_vk(params, empty)
    return params, vk, a, instance


def test_pinned_vk_matches_reference_golden(artifacts):
    _, vk, _, _ = artifacts
    expected = open(os.path.join(GOLDEN, "pinned_vk_plonk_api.txt")).read()
    assert vk.pinned_text() == expected


def test_reference_proof_verifies(artifacts):
    """Verify the reference's own hardcoded proof bytes end-to-end."""
    params, vk, a, instance = artifacts
    proof = open(os.path.join(GOLDEN, "plonk_api_proof.bin"), "rb").read()
    tr = TranscriptRead(VESTA, proof)
    strategy = SingleVerifier(params)
    verify_proof(params, vk, strategy,
                 [[[instance]], [[instance]]], tr)  # raises on failure


def test_mock_prover_satisfied(artifacts):
    from halo2_tpu.dev import MockProver
    _, _, a, instance = artifacts
    circuit = PlonkApiCircuit(a, [instance, a, a, 0])
    prover = MockProver.run(K, circuit, [[instance]], fs=FP)
    prover.assert_satisfied()


# --------------------------------------------------------------------------
# End-to-end PROVE over the lookup + multi-chunk permutation circuit
# (plonk_api.rs:438-496). The reference's stored proof pins the verifier;
# these pin the PROVER: lookup_commit_permuted / commit_product and a
# >1-chunk permutation commit run for real, with a fixed RNG so the proof
# bytes are a stable golden artifact.
# --------------------------------------------------------------------------

def _plonk_api_prove(params, pk, circuits, instances, seed=1234):
    import random
    from halo2_tpu.transcript import TranscriptWrite
    from halo2_tpu.plonk import create_proof
    tw = TranscriptWrite(VESTA)
    create_proof(params, pk, circuits, instances, random.Random(seed), tw)
    return tw.finalize()


def test_lookup_circuit_prove_and_verify(artifacts, monkeypatch):
    import hashlib
    from halo2_tpu.plonk import BatchVerifier
    from halo2_tpu.dev.cost import CircuitCost
    monkeypatch.setenv("HALO2_TPU_SANITY", "1")  # in-prover asserts on

    params, vk, a, instance = artifacts
    lookup_table = [instance, a, a, 0]
    circuit = PlonkApiCircuit(a, lookup_table)

    # multi-chunk permutation: 13 equality columns / (degree-2) chunk len
    cs = vk.cs
    chunk_len = max(cs.degree() - 2, 1)
    n_chunks = -(-len(cs.permutation.columns) // chunk_len)
    assert n_chunks > 1, "circuit must exercise >1 permutation chunk"

    pk = keygen_pk(params, vk, circuit)
    proof = _plonk_api_prove(params, pk, [circuit, circuit],
                             [[[instance]], [[instance]]])

    # byte-exact size from the static cost model (plonk_api.rs:491-496)
    expected = CircuitCost.measure(K, circuit).proof_size_exact(2).total
    assert len(proof) == expected

    # golden artifact: fixed RNG => stable bytes across runs/refactors
    golden_path = os.path.join(GOLDEN, "plonk_api_tpu_proof.bin")
    if os.environ.get("HALO2_TPU_TEST_GENERATE_NEW_PROOF") or \
            not os.path.exists(golden_path):
        with open(golden_path, "wb") as f:
            f.write(proof)
    golden = open(golden_path, "rb").read()
    assert hashlib.sha256(proof).hexdigest() == \
        hashlib.sha256(golden).hexdigest()

    tr = TranscriptRead(VESTA, proof)
    verify_proof(params, vk, SingleVerifier(params),
                 [[[instance]], [[instance]]], tr)

    batch = BatchVerifier(params)
    batch.add_proof([[[instance]], [[instance]]], proof)
    assert batch.finalize(vk)

    # wrong public input rejected
    from halo2_tpu.plonk import VerificationError
    with pytest.raises(VerificationError):
        tr_bad = TranscriptRead(VESTA, proof)
        verify_proof(params, vk, SingleVerifier(params),
                     [[[instance]], [[instance + 1]]], tr_bad)


def test_lookup_bad_witness_rejected(artifacts):
    """A witness outside the lookup table must fail in
    lookup_commit_permuted (ConstraintSystemFailure), not produce a
    verifying proof."""
    params, vk, a, instance = artifacts
    bad_a = (a + 1) % FP.modulus  # not in the table
    circuit = PlonkApiCircuit(bad_a, [instance, a, a, 0])
    pk = keygen_pk(params, vk, circuit)
    with pytest.raises(ValueError, match="not contained in table"):
        _plonk_api_prove(params, pk, [circuit], [[[instance]]])
