"""Merkle path gadget: cond-swap + Sinsemilla layer hashes vs host
reference (halo2_gadgets/src/sinsemilla/merkle.rs tests analogue)."""
import random

from halo2_tpu.fields import FP
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.sinsemilla import HashDomain
from halo2_tpu.gadgets.sinsemilla.chip import SinsemillaChip
from halo2_tpu.gadgets.sinsemilla.merkle import (MerkleChip,
                                                 merkle_crh_host)
from halo2_tpu.gadgets.utilities.cond_swap import CondSwapChip

DOMAIN = "z.cash:test-MerkleCRH"
DEPTH = 2
RNG = random.Random(55)


class MerkleCircuit(Circuit):
    def __init__(self, leaf=None, path=None, pos=None):
        self.leaf = leaf
        self.path = path or [None] * DEPTH
        self.pos = pos

    def without_witnesses(self):
        return MerkleCircuit()

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(5)]
        swap_advices = [meta.advice_column() for _ in range(5)]
        for col in advices + swap_advices:
            meta.enable_equality(col)
        witness_pieces = meta.advice_column()
        fixed_y_q = meta.fixed_column()
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        lookup = (meta.lookup_table_column(), meta.lookup_table_column(),
                  meta.lookup_table_column())
        instance = meta.instance_column()
        meta.enable_equality(instance)
        sin_cfg = SinsemillaChip.configure(meta, advices, witness_pieces,
                                           fixed_y_q, lookup, FP)
        swap_cfg = CondSwapChip.configure(meta, FP, swap_advices)
        leaf_col = meta.advice_column()
        meta.enable_equality(leaf_col)
        return {"sin": sin_cfg, "swap": swap_cfg, "instance": instance,
                "leaf": leaf_col}

    def synthesize(self, config, layouter):
        sin_chip = SinsemillaChip(config["sin"])
        sin_chip.load_table(layouter)
        chip = MerkleChip(sinsemilla=sin_chip,
                          cond_swap=CondSwapChip(config["swap"]),
                          domain=HashDomain(DOMAIN))

        def wit(region):
            return region.assign_advice(
                "leaf", config["leaf"], 0,
                lambda: Value.known(self.leaf) if self.leaf is not None
                else Value.unknown())

        leaf = layouter.assign_region("witness leaf", wit)
        root = chip.compute_root(
            layouter, leaf,
            [Value.known(s) if s is not None else Value.unknown()
             for s in self.path],
            [Value.known((self.pos >> i) & 1) if self.pos is not None
             else Value.unknown() for i in range(DEPTH)])
        layouter.constrain_instance(root.cell, config["instance"], 0)


def host_root(domain, leaf, path, pos):
    node = leaf
    for i, sibling in enumerate(path):
        bit = (pos >> i) & 1
        left, right = (sibling, node) if bit else (node, sibling)
        node = merkle_crh_host(domain, i, left, right)
    return node


def test_merkle_path():
    domain = HashDomain(DOMAIN)
    leaf = RNG.randrange(FP.modulus)
    path = [RNG.randrange(FP.modulus) for _ in range(DEPTH)]
    pos = 0b10
    root = host_root(domain, leaf, path, pos)
    prover = MockProver.run(11, MerkleCircuit(leaf, path, pos), [[root]],
                            fs=FP)
    prover.assert_satisfied()

    bad = MockProver.run(11, MerkleCircuit(leaf, path, pos),
                         [[(root + 1) % FP.modulus]], fs=FP)
    assert bad.verify()
