"""Gadget-level byte parity with halo2_gadgets stored circuit data.

Mirrors MyShortRangeCheckCircuit (halo2_gadgets/src/utilities/
lookup_range_check.rs:1004-1058) and checks against the golden artifacts
extracted verbatim from halo2_gadgets/src/test_circuits/circuit_data/:
vk_short_range_check_case{0,1,2}.rdata (the `{:#?}` pinned vk text) and
proof_short_range_check_case{0,1,2}.bin (proofs over Params<EqAffine>,
K=11, no public inputs — test_utils.rs:68-113).

Passing pins: the LookupRangeCheck chip's gate/lookup expression shapes
(incl. Scaled nodes), selector compression onto dedicated fixed columns,
the table + constants layout of the SimpleFloorPlanner, and the full
verifier against reference-produced proofs at K=11.
"""
import os

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import VESTA
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.poly import Params
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import (keygen_vk, verify_proof, SingleVerifier)
from halo2_tpu.gadgets.utilities.lookup_range_check import (
    LookupRangeCheckConfig, LookupRangeCheck45BConfig)

K = 11
LOOKUP_K = 10
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = {  # name -> (element, num_bits)   (lookup_range_check.rs:1077-1135)
    "case0": (0, 0),
    "case1": ((1 << LOOKUP_K) - 1, LOOKUP_K),
    "case2": ((1 << 6) - 1, 6),
}
CASES_45B = dict(CASES)  # same cases plus the pure-4-bit one (rs:1225-1232)
CASES_45B["case3"] = ((1 << 4) - 1, 4)


class ShortRangeCheckCircuit(Circuit):
    lookup_cls = LookupRangeCheckConfig

    def __init__(self, element=None, num_bits=0):
        self.element = element
        self.num_bits = num_bits

    def without_witnesses(self):
        return type(self)(None, self.num_bits)

    @classmethod
    def configure(cls, meta):
        running_sum = meta.advice_column()
        table_idx = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return cls.lookup_cls.configure(meta, FP, running_sum, table_idx,
                                        LOOKUP_K)

    def synthesize(self, config, layouter):
        config.load_table(layouter)
        config.witness_short_check(
            layouter,
            Value.known(self.element) if self.element is not None
            else Value.unknown(),
            self.num_bits)


class ShortRangeCheck45BCircuit(ShortRangeCheckCircuit):
    lookup_cls = LookupRangeCheck45BConfig


class LookupCheckCircuit(Circuit):
    """MyLookupCircuit (lookup_range_check.rs:881-976): two running-sum
    decompositions of num_words words — one strict (element = 2^60 - 1),
    one non-strict (element = 2^60)."""
    lookup_cls = LookupRangeCheckConfig

    def __init__(self, num_words=6):
        self.num_words = num_words

    def without_witnesses(self):
        return type(self)(self.num_words)

    @classmethod
    def configure(cls, meta):
        running_sum = meta.advice_column()
        table_idx = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return cls.lookup_cls.configure(meta, FP, running_sum, table_idx,
                                        LOOKUP_K)

    def synthesize(self, config, layouter):
        config.load_table(layouter)
        n = self.num_words * LOOKUP_K
        for element, strict in (((1 << n) - 1, True), (1 << n, False)):
            config.witness_check(layouter, Value.known(element),
                                 self.num_words, strict)


class LookupCheck45BCircuit(LookupCheckCircuit):
    lookup_cls = LookupRangeCheck45BConfig


@pytest.fixture(scope="module")
def params():
    return Params.new(VESTA, K, use_cache=False)


def _check(params, circuit, name):
    vk = keygen_vk(params, circuit)
    expected = open(os.path.join(GOLDEN, f"vk_{name}.rdata")).read()
    assert vk.pinned_text() + "\n" == expected
    proof = open(os.path.join(GOLDEN, f"proof_{name}.bin"), "rb").read()
    tr = TranscriptRead(VESTA, proof)
    verify_proof(params, vk, SingleVerifier(params), [[]], tr)


@pytest.mark.parametrize("case", sorted(CASES))
def test_short_range_check_parity(params, case):
    element, num_bits = CASES[case]
    _check(params, ShortRangeCheckCircuit(element, num_bits),
           f"short_range_check_{case}")


def test_lookup_range_check_parity(params):
    _check(params, LookupCheckCircuit(6), "lookup_range_check")


@pytest.mark.parametrize("case", sorted(CASES_45B))
def test_short_range_check_4_5b_parity(params, case):
    element, num_bits = CASES_45B[case]
    _check(params, ShortRangeCheck45BCircuit(element, num_bits),
           f"short_range_check_4_5b_{case}")


def test_lookup_range_check_4_5b_parity(params):
    _check(params, LookupCheck45BCircuit(6), "lookup_range_check_4_5b")
