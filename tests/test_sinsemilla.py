"""Sinsemilla: primitive sanity + in-circuit chip vs primitive
(halo2_gadgets/src/sinsemilla tests analogue)."""
import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import PALLAS
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.sinsemilla import (HashDomain, CommitDomain,
                                          hash_to_point, K)
from halo2_tpu.gadgets.sinsemilla.chip import SinsemillaChip
from halo2_tpu.gadgets.utilities import i2lebsp

DOMAIN = "z.cash:test-Sinsemilla"


def test_primitive_determinism_and_on_curve():
    d = HashDomain(DOMAIN)
    bits = i2lebsp(0b1010110011, 10) + i2lebsp(0x3FF, 10)
    p1 = d.hash_to_point(bits)
    p2 = d.hash_to_point(bits)
    assert p1 == p2 and PALLAS.is_on_curve(p1)
    assert d.hash_to_point(i2lebsp(1, 10)) != p1


class SinsemillaCircuit(Circuit):
    """Hash a 30-bit message (pieces of 2 + 1 words) and expose the
    output x-coordinate."""

    def __init__(self, piece1=None, piece2=None):
        self.piece1 = piece1  # 20-bit int
        self.piece2 = piece2  # 10-bit int

    def without_witnesses(self):
        return SinsemillaCircuit()

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(5)]
        witness_pieces = meta.advice_column()
        meta.enable_equality(witness_pieces)
        fixed_y_q = meta.fixed_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        lookup = (meta.lookup_table_column(), meta.lookup_table_column(),
                  meta.lookup_table_column())
        instance = meta.instance_column()
        meta.enable_equality(instance)
        cfg = SinsemillaChip.configure(meta, advices, witness_pieces,
                                       fixed_y_q, lookup, FP)
        return {"sinsemilla": cfg, "instance": instance}

    def synthesize(self, config, layouter):
        chip = SinsemillaChip(config["sinsemilla"])
        chip.load_table(layouter)
        d = HashDomain(DOMAIN)
        p1 = chip.witness_message_piece(
            layouter,
            Value.known(self.piece1) if self.piece1 is not None
            else Value.unknown(), 2)
        p2 = chip.witness_message_piece(
            layouter,
            Value.known(self.piece2) if self.piece2 is not None
            else Value.unknown(), 1)
        point, _zs = chip.hash_to_point(layouter, d.Q, [p1, p2])
        layouter.constrain_instance(point.x.cell, config["instance"], 0)


def test_sinsemilla_chip_matches_primitive():
    piece1 = 0b01101_11010_01100_10111  # 20 bits (2 words)
    piece2 = 0b10101_01010               # 10 bits (1 word)
    bits = i2lebsp(piece1, 20) + i2lebsp(piece2, 10)
    expected = hash_to_point(DOMAIN, bits)
    prover = MockProver.run(11, SinsemillaCircuit(piece1, piece2),
                            [[expected[0]]], fs=FP)
    prover.assert_satisfied()


def test_sinsemilla_chip_wrong_output_fails():
    piece1, piece2 = 12345, 678
    bits = i2lebsp(piece1, 20) + i2lebsp(piece2, 10)
    expected = hash_to_point(DOMAIN, bits)
    prover = MockProver.run(11, SinsemillaCircuit(piece1, piece2),
                            [[(expected[0] + 1) % FP.modulus]], fs=FP)
    assert prover.verify()


class PrivateInitCircuit(Circuit):
    """hash_to_point from a witnessed (private) Q point."""

    def __init__(self, q=None, piece=None):
        self.q = q
        self.piece = piece

    def without_witnesses(self):
        return PrivateInitCircuit()

    @classmethod
    def configure(cls, meta):
        from halo2_tpu.gadgets.ecc import EccChip
        advices = [meta.advice_column() for _ in range(5)]
        witness_pieces = meta.advice_column()
        meta.enable_equality(witness_pieces)
        fixed_y_q = meta.fixed_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        lookup = (meta.lookup_table_column(), meta.lookup_table_column(),
                  meta.lookup_table_column())
        instance = meta.instance_column()
        meta.enable_equality(instance)
        ecc_advices = [meta.advice_column() for _ in range(10)]
        ecc_lagrange = [meta.fixed_column() for _ in range(8)]
        from halo2_tpu.gadgets.utilities.lookup_range_check import \
            LookupRangeCheckConfig as _LRC
        ecc_range = _LRC.configure(meta, FP, ecc_advices[9], lookup[0])
        ecc = EccChip.configure(meta, ecc_advices, ecc_lagrange,
                                ecc_range, FP)
        cfg = SinsemillaChip.configure(
            meta, advices, witness_pieces, fixed_y_q, lookup, FP,
            allow_init_from_private_point=True)
        return {"sin": cfg, "ecc": ecc, "instance": instance}

    def synthesize(self, config, layouter):
        from halo2_tpu.gadgets.ecc import EccChip
        chip = SinsemillaChip(config["sin"])
        chip.load_table(layouter)
        ecc = EccChip(config["ecc"])
        q_pt = ecc.witness_point_non_id(
            layouter,
            Value.known(self.q) if self.q is not None else Value.unknown())
        p1 = chip.witness_message_piece(
            layouter,
            Value.known(self.piece) if self.piece is not None
            else Value.unknown(), 2)
        point, _ = chip.hash_to_point_with_private_init(layouter, q_pt,
                                                        [p1])
        layouter.constrain_instance(point.x.cell, config["instance"], 0)


def test_private_init_hash():
    from halo2_tpu.gadgets.sinsemilla.primitive import (sinsemilla_s,
                                                        _incomplete_add)
    q = PALLAS.mul(PALLAS.generator, 987654321)
    piece = 0b0110011010_1010010110
    # host reference from the private Q
    acc = q
    for i in range(2):
        word = (piece >> (K * i)) & ((1 << K) - 1)
        acc = _incomplete_add(_incomplete_add(acc, sinsemilla_s(word)), acc)
    prover = MockProver.run(11, PrivateInitCircuit(q, piece), [[acc[0]]],
                            fs=FP)
    prover.assert_satisfied()


def test_private_init_requires_flag():
    from halo2_tpu.plonk.error import IllegalHashFromPrivatePoint
    d = HashDomain(DOMAIN)
    # a chip configured WITHOUT the flag must refuse
    prover_cls = SinsemillaCircuit  # public-init config
    import pytest as _pytest
    from halo2_tpu.plonk.circuit import ConstraintSystem
    meta = ConstraintSystem()
    cfg = SinsemillaCircuit.configure(meta)["sinsemilla"]
    chip = SinsemillaChip(cfg)
    with _pytest.raises(IllegalHashFromPrivatePoint):
        chip.hash_to_point_with_private_init(None, None, [])
