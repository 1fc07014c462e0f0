"""Batch-region synthesis (Layouter.assign_regions) equivalence tests.

The BatchRegion docstring (circuit/layouter.py) claims the layout,
permutation cycles, and vk produced by one assign_regions(count=N) call
are byte-identical to N sequential assign_region calls. These tests
assert that claim on both sink paths:
  - the batch-sink path (keygen Assembly / prover WitnessCollection,
    which implement assign_advice_batch & co.), via vk transcript_repr
    and full proof-byte equality;
  - the per-stamp fallback path (MockProver has no batch methods), via
    MockProver verification and recorded cell/copy state equality.

Also regression-tests the floor_planner='v1' plan-replay path (a cached
V1Plan must not crash or change layout on the second proof).
"""
import random

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import TranscriptRead, TranscriptWrite
from halo2_tpu.poly import Params
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier)

K = 5
N_STAMPS = 4
FS = PALLAS.scalar


@pytest.fixture(scope="module")
def params():
    return Params.new(PALLAS, K, use_cache=False)


def _configure(meta):
    col_a = meta.advice_column()
    col_b = meta.advice_column()
    instance = meta.instance_column()
    s_mul = meta.selector()
    meta.enable_equality(col_a)
    meta.enable_equality(col_b)
    meta.enable_equality(instance)

    def gate(cells):
        a = cells.query_advice(col_a, Rotation(0))
        b = cells.query_advice(col_b, Rotation(0))
        out = cells.query_advice(col_a, Rotation(1))
        s = cells.query_selector(s_mul)
        return [("mul", s * (a * b - out))]

    meta.create_gate("mul", gate)
    return {"a": col_a, "b": col_b, "instance": instance, "s_mul": s_mul}


class SeqCircuit(Circuit):
    """N_STAMPS structurally identical mul regions via sequential
    assign_region calls, chained by copy constraints (out_i == a_{i+1})."""

    def __init__(self, pairs=None):
        self.pairs = pairs or [(0, 0)] * N_STAMPS

    def without_witnesses(self):
        return SeqCircuit()

    @classmethod
    def configure(cls, meta):
        return _configure(meta)

    def synthesize(self, config, layouter):
        outs = []

        def mk(a, b):
            def region_fn(region):
                region.enable_selector("s", config["s_mul"], 0)
                cell_a = region.assign_advice(
                    "a", config["a"], 0, lambda: Value.known(a))
                region.assign_advice(
                    "b", config["b"], 0, lambda: Value.known(b))
                out = region.assign_advice(
                    "out", config["a"], 1,
                    lambda: Value.known(FS.mul(a, b)))
                region.constrain_equal(cell_a.cell, cell_a.cell)
                return out
            return region_fn

        for a, b in self.pairs:
            outs.append(layouter.assign_region("mul", mk(a, b)))
        layouter.constrain_instance(outs[-1].cell, config["instance"], 0)


class BatchCircuit(Circuit):
    """The same circuit via ONE assign_regions call."""

    def __init__(self, pairs=None):
        self.pairs = pairs or [(0, 0)] * N_STAMPS

    def without_witnesses(self):
        return BatchCircuit()

    @classmethod
    def configure(cls, meta):
        return _configure(meta)

    def synthesize(self, config, layouter):
        pairs = self.pairs

        def batch_fn(br):
            br.enable_selector("s", config["s_mul"], 0)
            cell_a = br.assign_advice(
                "a", config["a"], 0, [a for a, _ in pairs])
            br.assign_advice("b", config["b"], 0, [b for _, b in pairs])
            out = br.assign_advice(
                "out", config["a"], 1,
                [FS.mul(a, b) for a, b in pairs])
            br.constrain_equal(cell_a, cell_a)
            return out

        out = layouter.assign_regions("mul", N_STAMPS, batch_fn)
        layouter.constrain_instance(out.cell(N_STAMPS - 1),
                                    config["instance"], 0)


PAIRS = [(3, 5), (7, 11), (2, 9), (6, 13)]
LAST_OUT = FS.mul(*PAIRS[-1])


def _prove(params, pk, circuit, seed=99):
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk, [circuit], [[[LAST_OUT]]],
                 random.Random(seed), tw)
    return tw.finalize()


def test_batch_vk_matches_sequential(params):
    """Batch-sink path (keygen Assembly): identical vk bytes."""
    vk_seq = keygen_vk(params, SeqCircuit(PAIRS))
    vk_batch = keygen_vk(params, BatchCircuit(PAIRS))
    assert vk_seq.transcript_repr() == vk_batch.transcript_repr()


def test_batch_proof_matches_sequential(params):
    """Batch-sink path (WitnessCollection): identical proof bytes with a
    fixed RNG, and both verify."""
    seq, batch = SeqCircuit(PAIRS), BatchCircuit(PAIRS)
    vk_s = keygen_vk(params, seq)
    pk_s = keygen_pk(params, vk_s, seq)
    vk_b = keygen_vk(params, batch)
    pk_b = keygen_pk(params, vk_b, batch)

    proof_s = _prove(params, pk_s, seq)
    proof_b = _prove(params, pk_b, batch)
    assert proof_s == proof_b

    tr = TranscriptRead(PALLAS, proof_b)
    verify_proof(params, vk_b, SingleVerifier(params), [[[LAST_OUT]]], tr)


def test_batch_mock_prover_fallback(params):
    """Per-stamp fallback path: MockProver (no batch sink methods)
    records identical advice columns, selectors, and copies."""
    mp_seq = MockProver.run(K, SeqCircuit(PAIRS), [[LAST_OUT]])
    mp_batch = MockProver.run(K, BatchCircuit(PAIRS), [[LAST_OUT]])
    assert mp_seq.verify() == []
    assert mp_batch.verify() == []
    assert mp_seq.advice == mp_batch.advice
    assert mp_seq.selectors == mp_batch.selectors
    assert (mp_seq.permutation.map_col
            == mp_batch.permutation.map_col).all()
    assert (mp_seq.permutation.map_row
            == mp_batch.permutation.map_row).all()


def test_batch_second_proof_uses_cached_plan(params):
    """The pk-held SimplePlan replay path must produce the same bytes."""
    batch = BatchCircuit(PAIRS)
    vk = keygen_vk(params, batch)
    pk = keygen_pk(params, vk, batch)
    p1 = _prove(params, pk, batch)
    assert getattr(pk, "_synth_plan", None), "plan was not cached"
    p2 = _prove(params, pk, batch)  # replays the cached plan
    assert p1 == p2


class V1Mul(Circuit):
    """MulCircuit under floor_planner='v1' with a constant (exercises
    the V1 constants pass + plan replay)."""
    floor_planner = "v1"

    def __init__(self, a=None, b=None):
        self.a, self.b = a, b

    def without_witnesses(self):
        return V1Mul()

    @classmethod
    def configure(cls, meta):
        cfg = _configure(meta)
        meta.enable_constant(meta.fixed_column())
        return cfg

    def synthesize(self, config, layouter):
        a, b = self.a, self.b

        def region_fn(region):
            region.enable_selector("s", config["s_mul"], 0)
            # the constant 4 is part of the circuit shape (known even in
            # the witness-free measurement pass)
            region.assign_advice_from_constant("a", config["a"], 0, 4)
            region.assign_advice("b", config["b"], 0,
                                 lambda: Value.known(b))
            return region.assign_advice(
                "out", config["a"], 1,
                lambda: Value.known(FS.mul(4, b)))

        out = layouter.assign_region("mul", region_fn)
        layouter.constrain_instance(out.cell, config["instance"], 0)


def test_v1_plan_replay_second_proof(params):
    """Regression: cached V1Plan replay crashed with UnboundLocalError
    (floor_planner_v1.py constant_positions referenced after pass 2)."""
    a, b = 4, 9  # a == the in-circuit constant 4
    out = FS.mul(a, b)
    circ = V1Mul(a, b)
    vk = keygen_vk(params, circ)
    pk = keygen_pk(params, vk, circ)

    def prove():
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [V1Mul(a, b)], [[[out]]],
                     random.Random(7), tw)
        return tw.finalize()

    p1 = prove()
    p2 = prove()  # second proof replays pk._synth_plan["v1"]
    assert p1 == p2
    tr = TranscriptRead(PALLAS, p1)
    verify_proof(params, vk, SingleVerifier(params), [[[out]]], tr)
