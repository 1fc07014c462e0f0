"""Sinsemilla chip byte parity with halo2_gadgets stored circuit data.

Mirrors MySinsemillaCircuit (halo2_gadgets/src/sinsemilla.rs tests,
~line 66-400): EccChip + two SinsemillaChips sharing one generator
table, hashing a MerkleCRH parent (l + left + right, 510 bits) with
chip 1 and committing a 500-bit message with chip 2 ([r]R full-width
fixed-base mul + complete add), checked against vk_sinsemilla_chip.rdata
and proof_sinsemilla_chip.bin (Params<EqAffine>, K=11, no public
inputs), plus the MySinsemillaCircuitWithHashFromPrivatePoint 4_5B
variant goldens.
"""
import os
import random

import pytest

from halo2_tpu.fields import FP
from halo2_tpu.curves import PALLAS, VESTA
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.poly import Params
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import keygen_vk, verify_proof, SingleVerifier
from halo2_tpu.gadgets.ecc import EccChip, FixedPointBase
from halo2_tpu.gadgets.ecc.constants import NUM_WINDOWS
from halo2_tpu.gadgets.sinsemilla.chip import SinsemillaChip
from halo2_tpu.gadgets.sinsemilla.gadget import (HashDomainGadget,
                                                 CommitDomainGadget)
from halo2_tpu.gadgets.sinsemilla.primitive import CommitDomain
from halo2_tpu.gadgets.utilities.lookup_range_check import (
    LookupRangeCheckConfig, LookupRangeCheck45BConfig)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
K = 10  # sinsemilla word size

# TestHashDomain / TestCommitDomain (sinsemilla.rs tests):
# Q and R of the "MerkleCRH" commit domain.
COMMIT_DOMAIN = CommitDomain("MerkleCRH")


def bits_to_int(bits):
    acc = 0
    for i, b in enumerate(bits):
        acc |= int(b) << i
    return acc


class SinsemillaMirrorCircuit(Circuit):
    LOOKUP_CONFIG = LookupRangeCheckConfig
    ALLOW_PRIVATE_INIT = False

    def __init__(self, witness=False):
        self.witness = witness

    def without_witnesses(self):
        return type(self)(False)

    @classmethod
    def configure(cls, meta):
        # column allocation order mirrors sinsemilla.rs tests configure
        advices = [meta.advice_column() for _ in range(10)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        table_idx = meta.lookup_table_column()
        lagrange = [meta.fixed_column() for _ in range(8)]
        lookup = (table_idx, meta.lookup_table_column(),
                  meta.lookup_table_column())
        range_check = cls.LOOKUP_CONFIG.configure(
            meta, FP, advices[9], table_idx)
        ecc_config = EccChip.configure(meta, advices, lagrange,
                                       range_check, FP)
        config1 = SinsemillaChip.configure(
            meta, advices[0:5], advices[2], lagrange[0], lookup, FP,
            range_check,
            allow_init_from_private_point=cls.ALLOW_PRIVATE_INIT)
        config2 = SinsemillaChip.configure(
            meta, advices[5:10], advices[7], lagrange[1], lookup, FP,
            range_check,
            allow_init_from_private_point=cls.ALLOW_PRIVATE_INIT)
        return (ecc_config, config1, config2)

    def synthesize(self, config, layouter):
        rng = random.Random(20260818)
        ecc_chip = EccChip(config[0])
        chip1 = SinsemillaChip(config[1])
        chip1.load_table(layouter)

        # ---- MerkleCRH parent with chip 1 ----
        merkle_crh = HashDomainGadget(chip=chip1, domain=COMMIT_DOMAIN.M)
        l_bits = [False] * K
        left_bits = [bool(rng.getrandbits(1)) for _ in range(250)]
        right_bits = [bool(rng.getrandbits(1)) for _ in range(250)]
        l = chip1.witness_message_piece(
            layouter, Value.known(bits_to_int(l_bits)), 1)
        left = chip1.witness_message_piece(
            layouter, Value.known(bits_to_int(left_bits)), 25)
        right = chip1.witness_message_piece(
            layouter, Value.known(bits_to_int(right_bits)), 25)

        expected_parent_val = COMMIT_DOMAIN.M.hash_to_point(
            l_bits + left_bits + right_bits)
        expected_parent = ecc_chip.witness_point_non_id(
            layouter, Value.known(expected_parent_val))
        parent, _zs = merkle_crh.hash_to_point(layouter,
                                               [l, left, right])
        ecc_chip.constrain_equal(layouter, parent, expected_parent)

        # ---- 500-bit commit with chip 2 ----
        chip2 = SinsemillaChip(config[2])
        test_commit = CommitDomainGadget(
            sinsemilla_chip=chip2, ecc_chip=ecc_chip,
            M=HashDomainGadget(chip=chip2, domain=COMMIT_DOMAIN.M),
            R=FixedPointBase(COMMIT_DOMAIN.R, NUM_WINDOWS))
        r_val = rng.randrange(PALLAS.scalar.modulus)
        msg_bits = [bool(rng.getrandbits(1)) for _ in range(500)]
        pieces = [
            chip2.witness_message_piece(
                layouter, Value.known(bits_to_int(msg_bits[:250])), 25),
            chip2.witness_message_piece(
                layouter, Value.known(bits_to_int(msg_bits[250:])), 25),
        ]
        result = test_commit.commit(layouter, pieces,
                                    Value.known(r_val))
        expected_result_val = COMMIT_DOMAIN.commit(msg_bits, r_val)
        expected_result = ecc_chip.witness_point_non_id(
            layouter, Value.known(expected_result_val))
        ecc_chip.constrain_equal(layouter, result, expected_result)


class SinsemillaPrivateInit45BCircuit(SinsemillaMirrorCircuit):
    """MySinsemillaCircuitWithHashFromPrivatePoint::<4_5B> — same
    synthesize; configure(meta, allow_init_from_private_point=true)
    with the tagged 4/5-bit lookup config."""
    LOOKUP_CONFIG = LookupRangeCheck45BConfig
    ALLOW_PRIVATE_INIT = True


CASES = [
    (SinsemillaMirrorCircuit, "sinsemilla_chip", 4576),
    (SinsemillaPrivateInit45BCircuit,
     "sinsemilla_with_private_init_chip_4_5b", 4672),
]


def test_proof_sizes_match_reference_golden():
    from halo2_tpu.dev.cost import CircuitCost
    for circuit_cls, _name, expect in CASES:
        got = CircuitCost.measure(
            11, circuit_cls(False)).proof_size_exact(1).total
        assert got == expect, (circuit_cls.__name__, got, expect)


@pytest.mark.parametrize("circuit_cls,name,size", CASES)
def test_sinsemilla_cs_parity(circuit_cls, name, size):
    """Constraint-system byte parity: rebuild the pinned vk text
    around the golden commitments (host-only, fast)."""
    import re
    from types import SimpleNamespace
    from halo2_tpu.plonk.circuit import ConstraintSystem
    from halo2_tpu.plonk.keygen import Assembly
    from halo2_tpu.plonk.compress_selectors import compress_selectors
    from halo2_tpu.plonk.keys import VerifyingKey
    from halo2_tpu.circuit import synthesize_circuit

    k = 11
    n = 1 << k
    text = open(os.path.join(GOLDEN, f"vk_{name}.rdata")).read()
    m = re.search(r"fixed_commitments: \[(.*?)\n    \]", text, re.S)
    gold_fixed = [(int(x, 16), int(y, 16)) for x, y in re.findall(
        r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))]
    m = re.search(r"permutation: VerifyingKey \{\s*commitments: "
                  r"\[(.*?)\n        \]", text, re.S)
    gold_perm = [(int(x, 16), int(y, 16)) for x, y in re.findall(
        r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))]

    cs = ConstraintSystem()
    circuit = circuit_cls(False)
    config = type(circuit).configure(cs)
    assembly = Assembly(cs, SimpleNamespace(n=n, k=k), VESTA.scalar)
    synthesize_circuit(assembly, circuit, config, cs.constants)
    cs2, _ = compress_selectors(cs, assembly.selectors)

    j = cs2.degree()
    extended_k = k
    while (1 << extended_k) < n * (j - 1):
        extended_k += 1
    P = VESTA.scalar.modulus
    omega = pow(VESTA.scalar.root_of_unity,
                1 << (VESTA.scalar.s - k), P)
    dom = SimpleNamespace(pinned=lambda: {
        "k": k, "extended_k": extended_k, "omega": omega})
    vk = VerifyingKey(VESTA, dom, gold_fixed, gold_perm, cs2, j)
    assert vk.pinned_text() + "\n" == text


@pytest.mark.parametrize("circuit_cls,name,size", CASES)
def test_sinsemilla_vk_and_proof_parity(circuit_cls, name, size):
    params = Params.new(VESTA, 11, use_cache=False)
    vk = keygen_vk(params, circuit_cls(False))
    expected = open(os.path.join(GOLDEN, f"vk_{name}.rdata")).read()
    assert vk.pinned_text() + "\n" == expected

    proof = open(os.path.join(GOLDEN, f"proof_{name}.bin"),
                 "rb").read()
    assert len(proof) == size
    tr = TranscriptRead(VESTA, proof)
    verify_proof(params, vk, SingleVerifier(params), [[]], tr)
