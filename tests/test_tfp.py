"""dev.tfp synthesis tracing (TracingFloorPlanner analogue,
halo2_proofs/src/dev/tfp.rs:78-478): span structure + observation-only
guarantees."""
import random

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import TranscriptWrite
from halo2_tpu.poly import Params
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.dev.tfp import attach_tracing, detach_tracing, RegionSpan
from halo2_tpu.plonk import keygen_vk, keygen_pk, create_proof

K = 4
FS = PALLAS.scalar


class TwoRegionCircuit(Circuit):
    """Two named regions with a known mix of assignments + one copy."""

    def __init__(self, a=None):
        self.a = a

    def without_witnesses(self):
        return TwoRegionCircuit()

    @classmethod
    def configure(cls, meta):
        col_a = meta.advice_column()
        col_f = meta.fixed_column()
        s = meta.selector()
        meta.enable_equality(col_a)

        def gate(cells):
            a = cells.query_advice(col_a, Rotation(0))
            f = cells.query_fixed(col_f)
            sel = cells.query_selector(s)
            return [("g", sel * (a - f))]

        meta.create_gate("g", gate)
        return {"a": col_a, "f": col_f, "s": s}

    def synthesize(self, config, layouter):
        def first(region):
            region.enable_selector("s", config["s"], 0)
            region.assign_fixed("f", config["f"], 0,
                                lambda: Value.known(7))
            return region.assign_advice("a", config["a"], 0,
                                        lambda: Value.known(self.a))

        c1 = layouter.namespace("ns1").assign_region("first", first)

        def second(region):
            cell = region.assign_advice("a2", config["a"], 0,
                                        lambda: Value.known(self.a))
            region.constrain_equal(cell.cell, c1.cell)
            return cell

        layouter.assign_region("second", second)


def test_span_structure_mock_prover():
    circ = TwoRegionCircuit(7)
    events = attach_tracing(circ)
    MockProver.run(K, circ, []).assert_satisfied()

    assert [e.name for e in events] == ["first", "second"]
    first, second = events
    assert isinstance(first, RegionSpan)
    assert first.index == 0 and second.index == 1
    assert first.advice == 1 and first.fixed == 1 and first.selectors == 1
    assert first.namespaces == ["ns1"]
    assert second.advice == 1 and second.copies == 1
    assert second.namespaces == []


def test_tracing_covers_keygen_and_prove_and_is_observation_only():
    params = Params.new(PALLAS, K, use_cache=False)
    plain = TwoRegionCircuit(7)
    vk_plain = keygen_vk(params, plain)
    pk_plain = keygen_pk(params, vk_plain, plain)
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk_plain, [plain], [[]], random.Random(5), tw)
    proof_plain = tw.finalize()

    traced = TwoRegionCircuit(7)
    events = attach_tracing(traced)
    vk_t = keygen_vk(params, traced)
    n_keygen = len(events)
    assert n_keygen == 2, "keygen synthesis must be traced"
    pk_t = keygen_pk(params, vk_t, traced)
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk_t, [traced], [[]], random.Random(5), tw)
    proof_t = tw.finalize()
    assert len(events) > n_keygen, "witness synthesis must be traced"

    # observation only: identical vk + proof bytes
    assert vk_plain.transcript_repr() == vk_t.transcript_repr()
    assert proof_plain == proof_t

    detach_tracing(traced)
    MockProver.run(K, traced, [])
    count = len(events)
    MockProver.run(K, traced, [])
    assert len(events) == count, "detach must stop tracing"
