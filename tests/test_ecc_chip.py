"""ECC chip: witness/add/mul constraints against host curve arithmetic
(halo2_gadgets/src/ecc/chip tests analogue)."""
import random

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import PALLAS
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.ecc import EccChip

RNG = random.Random(31337)
K = 8


def rand_point():
    return PALLAS.mul(PALLAS.generator, RNG.randrange(1, 1 << 100))


class EccCircuit(Circuit):
    """Witness P, Q; check P+Q (complete/incomplete) and small scalar
    mul against precomputed expectations via constrained equality."""

    def __init__(self, p=None, q=None, scalar=None, mode="add"):
        self.p, self.q, self.scalar, self.mode = p, q, scalar, mode

    def without_witnesses(self):
        return EccCircuit(mode=self.mode, scalar=None)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        cfg = EccChip.configure(meta, advices, FP)
        return {"ecc": cfg, "instance": instance}

    def synthesize(self, config, layouter):
        chip = EccChip(config["ecc"])

        def pt(v):
            return Value.known((0, 0) if v is None else v)

        p = chip.witness_point(layouter, pt(self.p))
        if self.mode == "add":
            q = chip.witness_point(layouter, pt(self.q))
            r = chip.add(layouter, p, q)
        elif self.mode == "add_incomplete":
            q = chip.witness_point_non_id(layouter, Value.known(self.q))
            r = chip.add_incomplete(layouter, p, q)
        else:  # mul
            r = chip.mul(layouter,
                         Value.known(self.scalar)
                         if self.scalar is not None else Value.unknown(),
                         p, num_bits=8)
        layouter.constrain_instance(r.x.cell, config["instance"], 0)
        layouter.constrain_instance(r.y.cell, config["instance"], 1)


def _expected_instance(r):
    return [[0, 0]] if r is None else [[r[0], r[1]]]


def test_complete_add():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    MockProver.run(K, EccCircuit(p, q, mode="add"),
                   [[r[0], r[1]]], fs=FP).assert_satisfied()


def test_complete_add_edge_cases():
    p = rand_point()
    # P + identity
    MockProver.run(K, EccCircuit(p, None, mode="add"),
                   [[p[0], p[1]]], fs=FP).assert_satisfied()
    # P + P (doubling)
    d = PALLAS.double(p)
    MockProver.run(K, EccCircuit(p, p, mode="add"),
                   [[d[0], d[1]]], fs=FP).assert_satisfied()
    # P + (-P) = identity
    MockProver.run(K, EccCircuit(p, PALLAS.neg(p), mode="add"),
                   [[0, 0]], fs=FP).assert_satisfied()


def test_complete_add_wrong_result_fails():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    errors = MockProver.run(K, EccCircuit(p, q, mode="add"),
                            [[r[0], (r[1] + 1) % FP.modulus]],
                            fs=FP).verify()
    assert errors


def test_incomplete_add():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    MockProver.run(K, EccCircuit(p, q, mode="add_incomplete"),
                   [[r[0], r[1]]], fs=FP).assert_satisfied()


def test_witness_point_not_on_curve_fails():
    errors = MockProver.run(K, EccCircuit((3, 4), None, mode="add"),
                            [[3, 4]], fs=FP).verify()
    assert errors


def test_var_base_mul_small():
    p = rand_point()
    s = 173  # 8-bit scalar
    r = PALLAS.mul(p, s)
    MockProver.run(K, EccCircuit(p, scalar=s, mode="mul"),
                   [[r[0], r[1]]], fs=FP).assert_satisfied()
