"""ECC chip: witness/add constraints against host curve arithmetic
(halo2_gadgets/src/ecc/chip tests analogue).  Variable-base and
fixed-base mul are exercised end-to-end by the K=11 golden-parity
mirror (tests/test_ecc_parity.py)."""
import random

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import PALLAS
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.ecc import EccChip
from halo2_tpu.gadgets.utilities.lookup_range_check import (
    LookupRangeCheckConfig)

RNG = random.Random(31337)
K = 8


def rand_point():
    return PALLAS.mul(PALLAS.generator, RNG.randrange(1, 1 << 100))


class EccCircuit(Circuit):
    """Witness P, Q; check P+Q (complete/incomplete) via constrained
    equality with the instance."""

    def __init__(self, p=None, q=None, mode="add"):
        self.p, self.q, self.mode = p, q, mode

    def without_witnesses(self):
        return EccCircuit(mode=self.mode)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(10)]
        lookup_table = meta.lookup_table_column()
        lagrange = [meta.fixed_column() for _ in range(8)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        range_check = LookupRangeCheckConfig.configure(
            meta, FP, advices[9], lookup_table)
        cfg = EccChip.configure(meta, advices, lagrange, range_check, FP)
        return {"ecc": cfg, "instance": instance}

    def synthesize(self, config, layouter):
        chip = EccChip(config["ecc"])

        def pt(v):
            return Value.known((0, 0) if v is None else v)

        p = chip.witness_point(layouter, pt(self.p))
        if self.mode == "add":
            q = chip.witness_point(layouter, pt(self.q))
            r = chip.add(layouter, p, q)
        else:  # add_incomplete
            q = chip.witness_point_non_id(layouter, Value.known(self.q))
            r = chip.add_incomplete(layouter, p, q)
        layouter.constrain_instance(r.x.cell, config["instance"], 0)
        layouter.constrain_instance(r.y.cell, config["instance"], 1)


def _expected_instance(r):
    return [[0, 0]] if r is None else [[r[0], r[1]]]


def test_complete_add():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    MockProver.run(K, EccCircuit(p, q, "add"),
                   _expected_instance(r), fs=FP).assert_satisfied()


def test_complete_add_edge_cases():
    p = rand_point()
    neg_p = PALLAS.neg(p)
    # P + (-P) = identity
    MockProver.run(K, EccCircuit(p, neg_p, "add"),
                   _expected_instance(None), fs=FP).assert_satisfied()
    # P + identity = P
    MockProver.run(K, EccCircuit(p, None, "add"),
                   _expected_instance(p), fs=FP).assert_satisfied()
    # identity + identity
    MockProver.run(K, EccCircuit(None, None, "add"),
                   _expected_instance(None), fs=FP).assert_satisfied()
    # P + P (doubling)
    MockProver.run(K, EccCircuit(p, p, "add"),
                   _expected_instance(PALLAS.double(p)),
                   fs=FP).assert_satisfied()


def test_complete_add_wrong_result_fails():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    bad = (r[0], (r[1] + 1) % FP.modulus)
    assert MockProver.run(K, EccCircuit(p, q, "add"),
                          _expected_instance(bad), fs=FP).verify()


def test_incomplete_add():
    p, q = rand_point(), rand_point()
    r = PALLAS.add(p, q)
    MockProver.run(K, EccCircuit(p, q, "add_incomplete"),
                   _expected_instance(r), fs=FP).assert_satisfied()


def test_witness_point_not_on_curve_fails():
    p = rand_point()
    bad = (p[0], (p[1] + 1) % FP.modulus)
    errors = MockProver.run(K, EccCircuit(bad, bad, "add"),
                            _expected_instance(PALLAS.add(bad, bad)
                                               if False else (0, 0)),
                            fs=FP).verify()
    assert errors


def test_witness_non_id_rejects_identity():
    with pytest.raises(Exception):
        MockProver.run(K, EccCircuit(rand_point(), None,
                                     "add_incomplete"),
                       _expected_instance(None), fs=FP)
