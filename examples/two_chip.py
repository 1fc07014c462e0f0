"""Port of the reference's `two-chip` example (halo2_proofs/examples/
two-chip.rs): a FieldChip composed of separate Add and Mul sub-chips,
computing c = a^2 + b^2 with the result exposed as a public input.
Checked with MockProver.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halo2_tpu.fields import FQ  # noqa: E402
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.poly.polynomial import Rotation  # noqa: E402
from halo2_tpu.dev import MockProver  # noqa: E402


class AddChip:
    def __init__(self, config):
        self.config = config

    @staticmethod
    def configure(meta, advice):
        s_add = meta.selector()

        def gate(cells):
            lhs = cells.query_advice(advice[0], Rotation(0))
            rhs = cells.query_advice(advice[1], Rotation(0))
            out = cells.query_advice(advice[0], Rotation(1))
            s = cells.query_selector(s_add)
            return [("add", s * (lhs + rhs - out))]

        meta.create_gate("add", gate)
        return {"advice": advice, "s_add": s_add}

    def add(self, layouter, a, b):
        cfg = self.config

        def region_fn(region):
            region.enable_selector("s_add", cfg["s_add"], 0)
            a2 = a.copy_advice("lhs", region, cfg["advice"][0], 0)
            b2 = b.copy_advice("rhs", region, cfg["advice"][1], 0)
            val = a2.value.add(b2.value, FQ)
            return region.assign_advice("lhs + rhs", cfg["advice"][0], 1,
                                        lambda: val)

        return layouter.assign_region("add", region_fn)


class MulChip:
    def __init__(self, config):
        self.config = config

    @staticmethod
    def configure(meta, advice):
        s_mul = meta.selector()

        def gate(cells):
            lhs = cells.query_advice(advice[0], Rotation(0))
            rhs = cells.query_advice(advice[1], Rotation(0))
            out = cells.query_advice(advice[0], Rotation(1))
            s = cells.query_selector(s_mul)
            return [("mul", s * (lhs * rhs - out))]

        meta.create_gate("mul", gate)
        return {"advice": advice, "s_mul": s_mul}

    def mul(self, layouter, a, b):
        cfg = self.config

        def region_fn(region):
            region.enable_selector("s_mul", cfg["s_mul"], 0)
            a2 = a.copy_advice("lhs", region, cfg["advice"][0], 0)
            b2 = b.copy_advice("rhs", region, cfg["advice"][1], 0)
            val = a2.value.mul(b2.value, FQ)
            return region.assign_advice("lhs * rhs", cfg["advice"][0], 1,
                                        lambda: val)

        return layouter.assign_region("mul", region_fn)


class FieldChip:
    """Composes the two sub-chips (two-chip.rs FieldChip)."""

    def __init__(self, config):
        self.config = config
        self.add_chip = AddChip(config["add"])
        self.mul_chip = MulChip(config["mul"])

    @staticmethod
    def configure(meta):
        advice = [meta.advice_column(), meta.advice_column()]
        instance = meta.instance_column()
        for col in advice:
            meta.enable_equality(col)
        meta.enable_equality(instance)
        return {
            "advice": advice,
            "instance": instance,
            "add": AddChip.configure(meta, advice),
            "mul": MulChip.configure(meta, advice),
        }

    def load_private(self, layouter, value):
        cfg = self.config

        def region_fn(region):
            return region.assign_advice("private input",
                                        cfg["advice"][0], 0, lambda: value)
        return layouter.assign_region("load private", region_fn)


class MyCircuit(Circuit):
    def __init__(self, a=None, b=None):
        self.a, self.b = a, b

    def without_witnesses(self):
        return MyCircuit()

    @classmethod
    def configure(cls, meta):
        return FieldChip.configure(meta)

    def synthesize(self, config, layouter):
        chip = FieldChip(config)
        a = chip.load_private(layouter,
                              Value.known(self.a) if self.a is not None
                              else Value.unknown())
        b = chip.load_private(layouter,
                              Value.known(self.b) if self.b is not None
                              else Value.unknown())
        asq = chip.mul_chip.mul(layouter, a, a)
        bsq = chip.mul_chip.mul(layouter, b, b)
        c = chip.add_chip.add(layouter, asq, bsq)
        layouter.constrain_instance(c.cell, config["instance"], 0)


def main():
    fs = FQ
    a, b = 4, 7
    c = (a * a + b * b) % fs.modulus
    MockProver.run(5, MyCircuit(a, b), [[c]], fs=fs).assert_satisfied()
    print("two-chip MockProver: satisfied")
    bad = MockProver.run(5, MyCircuit(a, b), [[c + 1]], fs=fs)
    assert bad.verify()
    print("two-chip MockProver: wrong instance rejected")


if __name__ == "__main__":
    main()
