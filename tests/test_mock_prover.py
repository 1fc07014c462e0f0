"""MockProver tests (dev.rs:158-270 doc examples + negative tests)."""
import pytest

from halo2_tpu.fields import FQ
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.dev import (MockProver, ConstraintNotSatisfied,
                           PermutationFailure, LookupFailure, CircuitCost)

K = 4


class MulCircuit(Circuit):
    def __init__(self, a=None, b=None, tamper=False):
        self.a = a
        self.b = b
        self.tamper = tamper

    def without_witnesses(self):
        return MulCircuit()

    @classmethod
    def configure(cls, meta):
        col_a = meta.advice_column()
        col_b = meta.advice_column()
        instance = meta.instance_column()
        s_mul = meta.selector()
        meta.enable_equality(col_a)
        meta.enable_equality(instance)

        def gate(cells):
            a = cells.query_advice(col_a, Rotation(0))
            b = cells.query_advice(col_b, Rotation(0))
            out = cells.query_advice(col_a, Rotation(1))
            s = cells.query_selector(s_mul)
            return [("mul", s * (a * b - out))]

        meta.create_gate("mul", gate)
        return {"a": col_a, "b": col_b, "instance": instance, "s": s_mul}

    def synthesize(self, config, layouter):
        fs = FQ
        out_val = fs.mul(self.a, self.b)
        if self.tamper:
            out_val = (out_val + 1) % fs.modulus

        def region_fn(region):
            region.enable_selector("s", config["s"], 0)
            region.assign_advice("a", config["a"], 0,
                                 lambda: Value.known(self.a))
            region.assign_advice("b", config["b"], 0,
                                 lambda: Value.known(self.b))
            return region.assign_advice("out", config["a"], 1,
                                        lambda: Value.known(out_val))

        out = layouter.assign_region("mul", region_fn)
        layouter.constrain_instance(out.cell, config["instance"], 0)


class RangeCheckCircuit(Circuit):
    """value must be < 8 via a lookup table (exercises lookup checks)."""

    def __init__(self, value=None):
        self.value = value

    def without_witnesses(self):
        return RangeCheckCircuit()

    @classmethod
    def configure(cls, meta):
        advice = meta.advice_column()
        table = meta.lookup_table_column()
        q = meta.complex_selector()

        def lookup_fn(cells):
            v = cells.query_advice(advice, Rotation(0))
            s = cells.query_selector(q)
            return [(s * v, table)]

        meta.lookup("range", lookup_fn)
        return {"advice": advice, "table": table, "q": q}

    def synthesize(self, config, layouter):
        def table_fn(table):
            for i in range(8):
                table.assign_cell(f"t{i}", config["table"], i,
                                  lambda i=i: Value.known(i))
        layouter.assign_table("table", table_fn)

        def region_fn(region):
            region.enable_selector("q", config["q"], 0)
            region.assign_advice("v", config["advice"], 0,
                                 lambda: Value.known(self.value))
        layouter.assign_region("value", region_fn)


def test_mock_prover_satisfied():
    fs = FQ
    prover = MockProver.run(K, MulCircuit(3, 5), [[fs.mul(3, 5)]])
    prover.assert_satisfied()


def test_mock_prover_bad_gate():
    fs = FQ
    prover = MockProver.run(K, MulCircuit(3, 5, tamper=True),
                            [[(fs.mul(3, 5) + 1) % fs.modulus]])
    errors = prover.verify()
    assert any(isinstance(e, ConstraintNotSatisfied) for e in errors)


def test_mock_prover_bad_instance():
    fs = FQ
    prover = MockProver.run(K, MulCircuit(3, 5), [[99]])
    errors = prover.verify()
    assert any(isinstance(e, PermutationFailure) for e in errors)


def test_mock_prover_lookup():
    prover = MockProver.run(K, RangeCheckCircuit(5), [])
    prover.assert_satisfied()

    prover_bad = MockProver.run(K, RangeCheckCircuit(300), [])
    errors = prover_bad.verify()
    assert any(isinstance(e, LookupFailure) for e in errors)


def test_circuit_cost():
    cost = CircuitCost.measure(K, MulCircuit(3, 5))
    size = cost.proof_size()
    assert size.total > 0 and size.total % 32 == 0


def test_mock_prover_vectorized_gate_check():
    """Device-vectorized gate checker agrees with the host checker."""
    fs = FQ
    ok = MockProver.run(K, MulCircuit(3, 5), [[fs.mul(3, 5)]])
    assert ok.verify_vectorized() == []
    bad = MockProver.run(K, MulCircuit(3, 5, tamper=True),
                         [[(fs.mul(3, 5) + 1) % fs.modulus]])
    errors = bad.verify_vectorized()
    assert any(isinstance(e, ConstraintNotSatisfied) for e in errors)
