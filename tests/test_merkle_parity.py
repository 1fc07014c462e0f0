"""Merkle chip byte parity with halo2_gadgets stored circuit data.

Mirrors MyMerkleCircuit (halo2_gadgets/src/sinsemilla/merkle.rs:175-430):
two side-by-side MerkleChips sharing one generator table and range
check, hashing a 32-deep path, checked against vk_merkle_chip.rdata and
proof_merkle_chip.bin (Params<EqAffine>, K=11, no public inputs).
"""
import os
import random

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import VESTA
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.poly import Params
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import keygen_vk, verify_proof, SingleVerifier
from halo2_tpu.gadgets.utilities.lookup_range_check import (
    LookupRangeCheckConfig)
from halo2_tpu.gadgets.sinsemilla.chip import SinsemillaChip
from halo2_tpu.gadgets.sinsemilla.merkle import MerkleChip, MerklePath
from halo2_tpu.gadgets.sinsemilla.primitive import CommitDomain

MERKLE_DEPTH = 32
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# TestHashDomain (sinsemilla.rs:557-574): the "MerkleCRH" commit
# domain's hash point Q.
TEST_DOMAIN = CommitDomain("MerkleCRH")


class MerkleCircuit(Circuit):
    lookup_cls = LookupRangeCheckConfig
    allow_private_init = False

    def __init__(self, leaf=None, leaf_pos=None, path=None):
        self.leaf = leaf
        self.leaf_pos = leaf_pos
        self.path = path

    def without_witnesses(self):
        # Value::default() == known(0) for the reference's #[derive(Default)]
        return type(self)(0, 0, [0] * MERKLE_DEPTH)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        fixed_y_q_1 = meta.fixed_column()
        fixed_y_q_2 = meta.fixed_column()
        lookup = (meta.lookup_table_column(), meta.lookup_table_column(),
                  meta.lookup_table_column())
        range_check = cls.lookup_cls.configure(
            meta, FP, advices[9], lookup[0])
        sin1 = SinsemillaChip.configure(
            meta, advices[5:10], advices[7], fixed_y_q_1, lookup, FP,
            range_check,
            allow_init_from_private_point=cls.allow_private_init)
        config1 = MerkleChip.configure(meta, sin1)
        sin2 = SinsemillaChip.configure(
            meta, advices[0:5], advices[2], fixed_y_q_2, lookup, FP,
            range_check,
            allow_init_from_private_point=cls.allow_private_init)
        config2 = MerkleChip.configure(meta, sin2)
        return (config1, config2)

    def synthesize(self, config, layouter):
        SinsemillaChip(config[0].sinsemilla_config).load_table(layouter)
        chip_1 = MerkleChip(config[0])
        chip_2 = MerkleChip(config[1])

        def known(v):
            return Value.known(v) if v is not None else Value.unknown()

        leaf = chip_1.load_private(
            layouter, config[0].cond_swap_config.a, known(self.leaf))
        path = MerklePath(chips=[chip_1, chip_2],
                          domain=TEST_DOMAIN.M,
                          leaf_pos=known(self.leaf_pos),
                          path=[known(v) for v in
                                (self.path or [None] * MERKLE_DEPTH)])
        path.calculate_root(layouter, leaf)


def make_circuit(rng):
    leaf = rng.randrange(FP.modulus)
    pos = rng.getrandbits(32)
    path = [rng.randrange(FP.modulus) for _ in range(MERKLE_DEPTH)]
    return MerkleCircuit(leaf, pos, path)


def test_proof_sizes_match_reference_golden():
    """Byte-exact proof-size model vs the stored artifact sizes
    (BASELINE.md golden sizes; host-only)."""
    from halo2_tpu.dev.cost import CircuitCost
    for circ, expect in ((MerkleCircuit(), 4160),
                         (MerklePrivateInit45BCircuit(), 4160)):
        got = CircuitCost.measure(11, circ).proof_size_exact(1).total
        assert got == expect, (type(circ).__name__, got, expect)


def test_merkle_root_matches_host():
    """In-circuit root equals the host MerkleCRH fold (merkle.rs:344-390)."""
    from halo2_tpu.gadgets.sinsemilla.merkle import merkle_crh_host
    from halo2_tpu.dev import MockProver
    rng = random.Random(42)
    circuit = make_circuit(rng)
    # host root
    node = circuit.leaf
    for l, sibling in enumerate(circuit.path):
        bit = (circuit.leaf_pos >> l) & 1
        left, right = ((node, sibling) if bit == 0 else (sibling, node))
        node = merkle_crh_host(TEST_DOMAIN.M, l, left, right)
    prover = MockProver.run(11, circuit, [], fs=FP)
    prover.assert_satisfied()


class MerklePrivateInit45BCircuit(MerkleCircuit):
    """MyMerkleCircuitWithHashFromPrivatePoint (merkle.rs:450-575):
    same flow, but the chips allow private-init hashing and use the
    4_5B range check (tagged generator table)."""
    from halo2_tpu.gadgets.utilities.lookup_range_check import \
        LookupRangeCheck45BConfig as lookup_cls
    allow_private_init = True


@pytest.fixture(scope="module")
def params():
    return Params.new(VESTA, 11, use_cache=False)


@pytest.mark.parametrize("circuit_cls,name", [
    (MerkleCircuit, "merkle_chip"),
    (MerklePrivateInit45BCircuit, "merkle_with_private_init_chip_4_5b"),
])
def test_merkle_vk_and_proof_parity(params, circuit_cls, name):
    vk = keygen_vk(params, circuit_cls().without_witnesses())
    expected = open(os.path.join(GOLDEN, f"vk_{name}.rdata")).read()
    assert vk.pinned_text() + "\n" == expected

    proof = open(os.path.join(GOLDEN, f"proof_{name}.bin"), "rb").read()
    tr = TranscriptRead(VESTA, proof)
    verify_proof(params, vk, SingleVerifier(params), [[]], tr)
