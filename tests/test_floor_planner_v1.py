"""Floor planner V1: dual-pass layout (v1.rs + v1/strategy.rs)."""
from halo2_tpu.fields import FQ
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.circuit.floor_planner_v1 import (Allocations,
                                                slot_in_biggest_advice_first)
from halo2_tpu.circuit.layouter import RegionShape
from halo2_tpu.plonk.circuit import Column, ADVICE
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.dev import MockProver


def test_free_intervals():
    a = Allocations()
    a.insert(2, 3)   # [2,5)
    a.insert(8, 2)   # [8,10)
    gaps = list(a.free_intervals(0, None))
    assert gaps == [(0, 2), (5, 8), (10, None)]
    assert list(a.free_intervals(0, 9)) == [(0, 2), (5, 8)]
    assert a.unbounded_interval_start() == 10


def test_slot_in_biggest_advice_first():
    """strategy.rs test_slot_in analogue: biggest advice area first."""
    a0, a1 = Column(0, ADVICE), Column(1, ADVICE)
    s_small = RegionShape(0)
    s_small.columns = {a0}
    s_small.row_count = 2
    s_big = RegionShape(1)
    s_big.columns = {a0, a1}
    s_big.row_count = 5
    starts, allocs = slot_in_biggest_advice_first([s_small, s_big])
    # big region placed first at 0; small slots after it on a0
    assert starts == [5, 0]


class V1MulCircuit(Circuit):
    floor_planner = "v1"

    def __init__(self, a=None, b=None):
        self.a, self.b = a, b

    def without_witnesses(self):
        return V1MulCircuit()

    @classmethod
    def configure(cls, meta):
        col_a = meta.advice_column()
        col_b = meta.advice_column()
        instance = meta.instance_column()
        s_mul = meta.selector()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
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

        def region_fn(region):
            region.enable_selector("s", config["s"], 0)
            # pin `a` to a constant to exercise V1 constants packing
            region.assign_advice_from_constant("a", config["a"], 0, self.a
                                               if self.a is not None else 0)
            region.assign_advice("b", config["b"], 0,
                                 lambda: Value.known(self.b)
                                 if self.b is not None else Value.unknown())
            return region.assign_advice(
                "out", config["a"], 1,
                lambda: Value.known(fs.mul(self.a, self.b))
                if self.a is not None else Value.unknown())

        out = layouter.assign_region("mul", region_fn)
        layouter.constrain_instance(out.cell, config["instance"], 0)


def test_v1_mock_prover():
    fs = FQ
    prover = MockProver.run(4, V1MulCircuit(3, 7), [[21]], fs=FQ)
    prover.assert_satisfied()
    bad = MockProver.run(4, V1MulCircuit(3, 7), [[22]], fs=FQ)
    assert bad.verify()
