"""SHA-256 chip: one in-circuit compression vs the FIPS host primitive,
checked with the vectorized MockProver (big-row circuit)."""
import struct

import pytest

from halo2_tpu.fields import FQ
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.sha256 import (BlockWord, IV, compress_host,
                                      sha256_host)
from halo2_tpu.gadgets.sha256.chip import Sha256Chip

K = 14


class CompressCircuit(Circuit):
    """One SHA-256 compression of a 16-word block from the IV; exposes
    the 8 output state words."""

    def __init__(self, block=None):
        self.block = block

    def without_witnesses(self):
        return CompressCircuit()

    @classmethod
    def configure(cls, meta):
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        cfg = Sha256Chip.configure(meta, FQ)
        return {"sha": cfg, "instance": instance}

    def synthesize(self, config, layouter):
        chip = Sha256Chip(config["sha"])
        state = chip.initialization_vector(layouter)
        words = [BlockWord(Value.known(w) if self.block is not None
                           else Value.unknown())
                 for w in (self.block or [0] * 16)]
        out = chip.compress(layouter, state, words)
        for i, word in enumerate(out):
            layouter.constrain_instance(word.cell.cell,
                                        config["instance"], i)


def test_sha256_chip_compress():
    data = b"abc" + b"\x80" + b"\x00" * 52 + struct.pack(">Q", 24)
    block = list(struct.unpack(">16I", data))
    expected = compress_host(list(IV), block)
    prover = MockProver.run(K, CompressCircuit(block), [expected], fs=FQ)
    assert prover.verify_vectorized() == []
    # cross-check the digest framing end-to-end
    assert struct.pack(">8I", *expected) == sha256_host(b"abc")


def test_sha256_chip_wrong_output_fails():
    data = b"abc" + b"\x80" + b"\x00" * 52 + struct.pack(">Q", 24)
    block = list(struct.unpack(">16I", data))
    expected = compress_host(list(IV), block)
    bad = [expected[0] ^ 1] + expected[1:]
    prover = MockProver.run(K, CompressCircuit(block), [bad], fs=FQ)
    # permutation stream catches the instance mismatch (the gate streams
    # are skipped: at k=14 the host gate loop is impractical — gates are
    # covered by verify_vectorized in the positive test)
    errors = prover.verify(streams=("permutation",))
    assert errors
