"""Port of the reference's `simple-example` (halo2_proofs/examples/
simple-example.rs): a chip with mul/add-free NumericInstructions-style
API — load private values, multiply, expose the result — checked with
MockProver and then proven/verified end-to-end.

Run: python examples/simple_example.py  (CPU ok; TPU if attached)
"""
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                      "cpu"))

from halo2_tpu.curves import PALLAS  # noqa: E402
from halo2_tpu.fields import FQ  # noqa: E402
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.poly.polynomial import Rotation  # noqa: E402
from halo2_tpu.dev import MockProver  # noqa: E402


class FieldChip:
    """The NumericInstructions chip of the example: one gate
    s_mul · (lhs · rhs − out)."""

    def __init__(self, config):
        self.config = config

    @staticmethod
    def configure(meta):
        advice = [meta.advice_column(), meta.advice_column()]
        instance = meta.instance_column()
        constant = meta.fixed_column()
        for col in advice:
            meta.enable_equality(col)
        meta.enable_equality(instance)
        meta.enable_constant(constant)
        s_mul = meta.selector()

        def mul_gate(cells):
            lhs = cells.query_advice(advice[0], Rotation(0))
            rhs = cells.query_advice(advice[1], Rotation(0))
            out = cells.query_advice(advice[0], Rotation(1))
            s = cells.query_selector(s_mul)
            return [("mul", s * (lhs * rhs - out))]

        meta.create_gate("mul", mul_gate)
        return {"advice": advice, "instance": instance, "s_mul": s_mul}

    def load_private(self, layouter, value):
        cfg = self.config

        def region_fn(region):
            return region.assign_advice("private input", cfg["advice"][0],
                                        0, lambda: value)
        return layouter.assign_region("load private", region_fn)

    def load_constant(self, layouter, constant):
        cfg = self.config

        def region_fn(region):
            return region.assign_advice_from_constant(
                "constant value", cfg["advice"][0], 0, constant)
        return layouter.assign_region("load constant", region_fn)

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

    def expose_public(self, layouter, cell, row):
        layouter.constrain_instance(cell.cell, self.config["instance"], row)


class MyCircuit(Circuit):
    """c = constant * a^2 * b^2 (simple-example.rs MyCircuit)."""

    def __init__(self, constant=None, a=None, b=None):
        self.constant = constant
        self.a = a
        self.b = b

    def without_witnesses(self):
        return MyCircuit(constant=self.constant)

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
        const = chip.load_constant(layouter, self.constant)
        ab = chip.mul(layouter, a, b)
        absq = chip.mul(layouter, ab, ab)
        c = chip.mul(layouter, const, absq)
        chip.expose_public(layouter, c, 0)


def main():
    k = 5
    fs = FQ
    constant, a, b = 7, 2, 3
    c = constant * a * a * b * b % fs.modulus

    circuit = MyCircuit(constant, a, b)
    prover = MockProver.run(k, circuit, [[c]], fs=fs)
    prover.assert_satisfied()
    print("MockProver: satisfied")

    bad = MockProver.run(k, circuit, [[(c + 1) % fs.modulus]], fs=fs)
    assert bad.verify()
    print("MockProver: wrong instance rejected")

    if os.environ.get("SIMPLE_EXAMPLE_PROVE") == "1":
        from halo2_tpu.poly import Params
        from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                                     verify_proof, SingleVerifier)
        from halo2_tpu.transcript import TranscriptRead, TranscriptWrite
        params = Params.new(PALLAS, k)
        vk = keygen_vk(params, circuit)
        pk = keygen_pk(params, vk, circuit)
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [[[c]]], random.Random(0), tw)
        proof = tw.finalize()
        tr = TranscriptRead(PALLAS, proof)
        verify_proof(params, vk, SingleVerifier(params), [[[c]]], tr)
        print(f"proof verified ({len(proof)} bytes)")


if __name__ == "__main__":
    main()
