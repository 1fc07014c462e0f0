"""Utilities gadgets: lookup range check, running sum decomposition,
conditional swap — MockProver oracles (halo2_gadgets/src/utilities/*)."""
import pytest

from halo2_tpu.fields import FQ
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.utilities import (LookupRangeCheckConfig,
                                         RunningSumConfig, CondSwapChip)

K_TABLE = 4  # small table for tests (Orchard uses 10)


class RangeCheckCircuit(Circuit):
    def __init__(self, value=None, num_words=2, strict=True,
                 short_bits=None):
        self.value = value
        self.num_words = num_words
        self.strict = strict
        self.short_bits = short_bits

    def without_witnesses(self):
        return RangeCheckCircuit(num_words=self.num_words,
                                 strict=self.strict,
                                 short_bits=self.short_bits)

    @classmethod
    def configure(cls, meta):
        running_sum = meta.advice_column()
        table = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        cfg = LookupRangeCheckConfig.configure(meta, FQ, running_sum,
                                               table, k=K_TABLE)
        return cfg

    def synthesize(self, cfg, layouter):
        cfg.load_table(layouter)
        if self.short_bits is not None:
            cfg.witness_short_check(
                layouter,
                Value.known(self.value) if self.value is not None
                else Value.unknown(),
                self.short_bits)
        else:
            cfg.witness_check(
                layouter,
                Value.known(self.value) if self.value is not None
                else Value.unknown(),
                self.num_words, self.strict)


def test_range_check_ok():
    # 2 words of 4 bits: value < 256
    MockProver.run(7, RangeCheckCircuit(value=0xA7, num_words=2),
                   [], fs=FQ).assert_satisfied()


def test_range_check_too_big_fails():
    errors = MockProver.run(7, RangeCheckCircuit(value=0x1A7, num_words=2),
                            [], fs=FQ).verify()
    assert errors


def test_short_range_check():
    MockProver.run(7, RangeCheckCircuit(value=5, short_bits=3),
                   [], fs=FQ).assert_satisfied()
    errors = MockProver.run(7, RangeCheckCircuit(value=9, short_bits=3),
                            [], fs=FQ).verify()
    assert errors


class RunningSumCircuit(Circuit):
    W = 3

    def __init__(self, value=None, windows=4, strict=True):
        self.value = value
        self.windows = windows
        self.strict = strict

    def without_witnesses(self):
        return RunningSumCircuit(windows=self.windows, strict=self.strict)

    @classmethod
    def configure(cls, meta):
        z = meta.advice_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        return RunningSumConfig.configure(meta, FQ, z, cls.W)

    def synthesize(self, cfg, layouter):
        cfg.witness_decompose(
            layouter,
            Value.known(self.value) if self.value is not None
            else Value.unknown(),
            self.windows, self.strict)


def test_running_sum():
    # 4 windows of 3 bits: < 2^12
    MockProver.run(6, RunningSumCircuit(value=0xABC),
                   [], fs=FQ).assert_satisfied()
    errors = MockProver.run(6, RunningSumCircuit(value=0x1ABC),
                            [], fs=FQ).verify()
    assert errors


class SwapCircuit(Circuit):
    def __init__(self, a=None, b=None, swap=None):
        self.a, self.b, self.swap = a, b, swap

    def without_witnesses(self):
        return SwapCircuit()

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(5)]
        witness = meta.advice_column()
        meta.enable_equality(witness)
        cfg = CondSwapChip.configure(meta, FQ, advices)
        return {"swap": cfg, "witness": witness}

    def synthesize(self, config, layouter):
        chip = CondSwapChip(config["swap"])

        def wit(region):
            return region.assign_advice(
                "a", config["witness"], 0, lambda: Value.known(self.a))

        a_cell = layouter.assign_region("witness a", wit)
        chip.swap(layouter, (a_cell, Value.known(self.b)),
                  Value.known(self.swap))


@pytest.mark.parametrize("swap", [0, 1])
def test_cond_swap(swap):
    MockProver.run(5, SwapCircuit(a=10, b=20, swap=swap),
                   [], fs=FQ).assert_satisfied()


def test_cond_swap_nonbool_fails():
    errors = MockProver.run(5, SwapCircuit(a=10, b=20, swap=2),
                            [], fs=FQ).verify()
    assert errors


class Tagged45Circuit(Circuit):
    def __init__(self, value=None, bits=4):
        self.value = value
        self.bits = bits

    def without_witnesses(self):
        return Tagged45Circuit(bits=self.bits)

    @classmethod
    def configure(cls, meta):
        from halo2_tpu.gadgets.utilities.lookup_range_check import \
            LookupRangeCheck45BConfig
        running_sum = meta.advice_column()
        table = meta.lookup_table_column()
        tag = meta.lookup_table_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        # 4/5-bit tagged checks need k >= 5 (reference uses k = 10)
        return LookupRangeCheck45BConfig.configure_with_tag(
            meta, FQ, running_sum, table, tag, k=5)

    def synthesize(self, cfg, layouter):
        cfg.load_table(layouter)
        cfg.witness_short_check_tagged(
            layouter,
            Value.known(self.value) if self.value is not None
            else Value.unknown(), self.bits)


def test_tagged_4_5b_range_check():
    MockProver.run(7, Tagged45Circuit(value=13, bits=4),
                   [], fs=FQ).assert_satisfied()
    MockProver.run(7, Tagged45Circuit(value=29, bits=5),
                   [], fs=FQ).assert_satisfied()
    assert MockProver.run(7, Tagged45Circuit(value=17, bits=4),
                          [], fs=FQ).verify()
    assert MockProver.run(7, Tagged45Circuit(value=33, bits=5),
                          [], fs=FQ).verify()
