"""ECC chip byte parity with halo2_gadgets stored circuit data.

Mirrors MyEccCircuit (halo2_gadgets/src/ecc.rs:623-980, test_errors =
false) — the monolithic circuit exercising witness/add/add_incomplete/
variable-base mul/sign mul/full-width + short + base-field fixed-base
mul — against vk_ecc_chip.rdata and proof_ecc_chip.bin
(Params<EqAffine>, K=11, no public inputs).
"""
import os
import random

import pytest

from halo2_tpu.fields import FP, FQ
from halo2_tpu.curves import PALLAS, VESTA
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.poly import Params
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import keygen_vk, verify_proof, SingleVerifier
from halo2_tpu.gadgets.ecc import EccChip, FixedPointBase
from halo2_tpu.gadgets.ecc.constants import (NUM_WINDOWS,
                                             NUM_WINDOWS_SHORT)
from halo2_tpu.gadgets.utilities.lookup_range_check import (
    LookupRangeCheckConfig, LookupRangeCheck45BConfig)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

# TestFixedBases: all three kinds use the Pallas generator
# (ecc.rs:659-664)
BASE_FULL = FixedPointBase(PALLAS.generator, NUM_WINDOWS)
BASE_SHORT = FixedPointBase(PALLAS.generator, NUM_WINDOWS_SHORT)

# The canonical full-width scalar whose window sequence doubles on the
# last step (ecc.rs full_width tests LAST_DOUBLING, octal digits)
LAST_DOUBLING_OCT = ("1333333333333333333333333333333333333333333333333"
                     "333333333333333333333333333333333334")


def _oct_fold(s, modulus):
    acc = 0
    for c in s:
        acc = (acc * 8 + int(c, 8)) % modulus
    return acc


class EccMirrorCircuit(Circuit):
    """Like the reference MyEccCircuit, the witness values are generated
    INSIDE synthesize and are always known — even during keygen
    (ecc.rs:796-800 returns a normal circuit from without_witnesses and
    ecc.rs:848+ uses Value::known(OsRng) values unconditionally). This
    matters for layout: witnessing the identity as a NonIdentityPoint
    errors during the measurement pass, so those two regions are never
    placed and consume no rows."""

    LOOKUP_CONFIG = LookupRangeCheckConfig

    def __init__(self, witness=False):
        self.witness = witness

    def without_witnesses(self):
        return type(self)(False)

    @classmethod
    def configure(cls, meta):
        advices = [meta.advice_column() for _ in range(10)]
        lookup_table = meta.lookup_table_column()
        lagrange = [meta.fixed_column() for _ in range(8)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        range_check = cls.LOOKUP_CONFIG.configure(
            meta, FP, advices[9], lookup_table)
        return EccChip.configure(meta, advices, lagrange, range_check,
                                 FP)

    def synthesize(self, config, layouter):
        chip = EccChip(config)
        rc = config.lookup_config
        RNG = random.Random(20260817)

        def V(v):
            return Value.known(v)

        def VP(pt):
            return Value.known(pt)

        # load_range_check_table (ecc.rs:845)
        rc.load_table(layouter)

        p_val = PALLAS.mul(PALLAS.generator, RNG.randrange(1, 1 << 128))
        q_val = PALLAS.mul(PALLAS.generator, RNG.randrange(1, 1 << 128))
        p_neg_val = PALLAS.neg(p_val)

        p = chip.witness_point_non_id(layouter, VP(p_val))
        p_neg = chip.witness_point_non_id(layouter, VP(p_neg_val))
        q = chip.witness_point_non_id(layouter, VP(q_val))

        # witness identity as Point, and as NonIdentityPoint (which
        # errors only when values are known — ecc.rs:873-888)
        chip.witness_point(layouter, VP((0, 0)))
        try:
            chip.witness_point_non_id(layouter, VP((0, 0)))
        except ValueError:
            pass

        # witness_point::tests::test_witness_non_id — same again
        try:
            chip.witness_point_non_id(layouter, VP((0, 0)))
        except ValueError:
            pass

        # ---- add::tests::test_add (add.rs:382-500) ----
        def witness_non_id(val):
            return chip.witness_point_non_id(layouter, VP(val))

        zero = chip.add(layouter, p, p_neg)
        r = chip.add(layouter, zero, zero)
        chip.constrain_equal(layouter, r, zero)
        r = chip.add(layouter, p, q)
        w = witness_non_id(PALLAS.add(p_val, q_val))
        chip.constrain_equal(layouter, r, w)
        r = chip.add(layouter, p, p)
        w = witness_non_id(PALLAS.double(p_val))
        chip.constrain_equal(layouter, r, w)
        r = chip.add(layouter, p, zero)
        chip.constrain_equal(layouter, r, p)
        r = chip.add(layouter, zero, p)
        chip.constrain_equal(layouter, r, p)
        pm = FP.modulus
        zeta = FP.zeta
        endo = lambda pt: (pt[0] * zeta % pm, pt[1])
        endo_p = witness_non_id(endo(p_val))
        chip.add(layouter, p, endo_p)
        endo_p_neg = witness_non_id(endo(p_neg_val))
        chip.add(layouter, p, endo_p_neg)
        endo2_p = witness_non_id(endo(endo(p_val)))
        chip.add(layouter, p, endo2_p)
        endo2_p_neg = witness_non_id(endo(endo(p_neg_val)))
        chip.add(layouter, p, endo2_p_neg)

        # ---- add_incomplete::tests (test_errors=false) ----
        r = chip.add_incomplete(layouter, p, q)
        w = witness_non_id(PALLAS.add(p_val, q_val))
        chip.constrain_equal(layouter, r, w)

        # ---- mul::tests::test_mul (3 scalars) ----
        col = config.advices[0]
        q_scalar = PALLAS.scalar.modulus

        def expect_mul(scalar_base_val):
            s = scalar_base_val % q_scalar
            return PALLAS.mul(p_val, s)

        for scalar_val in (RNG.randrange(pm), 0, pm - 1):
            cell = chip.load_private(layouter, col, V(scalar_val))
            result, _ = chip.mul(layouter, cell, p)
            if scalar_val != 0:
                w = witness_non_id(expect_mul(scalar_val))
                chip.constrain_equal(layouter, result, w)

        # ---- mul_fixed::short::tests::test_mul_sign ----
        sp_val = PALLAS.mul(PALLAS.generator, RNG.randrange(1, 1 << 128))
        sp = chip.witness_point(layouter, VP(sp_val))
        sp_neg = chip.witness_point(layouter, VP(PALLAS.neg(sp_val)))
        identity = chip.witness_point(layouter, VP((0, 0)))
        pos_sign = chip.load_private(layouter, config.advices[0], V(1))
        neg_sign = chip.load_private(layouter, config.advices[1],
                                     V(pm - 1))
        r = chip.mul_sign(layouter, pos_sign, sp)
        chip.constrain_equal(layouter, r, sp)
        r = chip.mul_sign(layouter, neg_sign, sp)
        chip.constrain_equal(layouter, r, sp_neg)
        r = chip.mul_sign(layouter, pos_sign, identity)
        chip.constrain_equal(layouter, r, identity)
        r = chip.mul_sign(layouter, neg_sign, identity)
        chip.constrain_equal(layouter, r, identity)

        # ---- mul_fixed::full_width::tests (4 scalars) ----
        gen = PALLAS.generator
        for scalar in (RNG.randrange(q_scalar),
                       _oct_fold(LAST_DOUBLING_OCT, q_scalar),
                       0, q_scalar - 1):
            result = chip.mul_fixed(layouter, V(scalar), BASE_FULL)
            if scalar != 0:
                w = witness_non_id(PALLAS.mul(gen, scalar))
                chip.constrain_equal(layouter, result, w)

        # ---- mul_fixed::short::tests::test_mul_fixed_short ----
        magnitude_signs = [
            (RNG.getrandbits(64), 1 if RNG.getrandbits(1) else pm - 1),
            (0xFFFF_FFFF_FFFF_FFFF, 1),
            (0xFFFF_FFFF_FFFF_FFFF, pm - 1),
            (0xB6DB_6DB6_DB6D_B6DC, 1),
            (0xB6DB_6DB6_DB6D_B6DC, pm - 1),
        ]
        for magnitude, sign in magnitude_signs:
            m_cell = chip.load_private(layouter, config.advices[0],
                                       V(magnitude))
            s_cell = chip.load_private(layouter, config.advices[0],
                                       V(sign))
            result = chip.mul_fixed_short(layouter, (m_cell, s_cell),
                                          BASE_SHORT)
            scalar = magnitude if sign == 1 else (q_scalar - magnitude)
            w = witness_non_id(PALLAS.mul(gen, scalar % q_scalar))
            chip.constrain_equal(layouter, result, w)

        # zero_magnitude_signs: "mul by +zero" / "mul by -zero" — two
        # more short muls, identity-asserted only (short.rs tests; no
        # expected-point witness or constrain)
        for magnitude, sign in ((0, 1), (0, pm - 1)):
            m_cell = chip.load_private(layouter, config.advices[0],
                                       V(magnitude))
            s_cell = chip.load_private(layouter, config.advices[0],
                                       V(sign))
            chip.mul_fixed_short(layouter, (m_cell, s_cell), BASE_SHORT)

        # ---- mul_fixed::base_field_elem::tests (4 scalars) ----
        for scalar in (RNG.randrange(pm),
                       _oct_fold(LAST_DOUBLING_OCT, pm),
                       0, pm - 1):
            cell = chip.load_private(layouter, config.advices[0],
                                     V(scalar))
            result = chip.mul_fixed_base_field(layouter, cell, BASE_FULL)
            if scalar != 0:
                w = witness_non_id(PALLAS.mul(gen, scalar % q_scalar))
                chip.constrain_equal(layouter, result, w)


class EccMirror45BCircuit(EccMirrorCircuit):
    """MyEccCircuit::<PallasLookupRangeCheck4_5BConfig> (ecc.rs:999-1010,
    golden ecc_chip_4_5b, proof size 3968)."""
    LOOKUP_CONFIG = LookupRangeCheck45BConfig


@pytest.mark.parametrize("circuit_cls,name", [
    (EccMirrorCircuit, "ecc_chip"),
    (EccMirror45BCircuit, "ecc_chip_4_5b"),
])
def test_ecc_cs_parity(circuit_cls, name):
    """The constraint system (gates, queries, selector compression,
    domain) matches the golden vk byte-for-byte: rebuilding the pinned
    text around the golden commitments reproduces the stored rdata."""
    import re
    from types import SimpleNamespace
    from halo2_tpu.fields import FP
    from halo2_tpu.plonk.circuit import ConstraintSystem
    from halo2_tpu.plonk.keygen import Assembly
    from halo2_tpu.plonk.compress_selectors import compress_selectors
    from halo2_tpu.plonk.keys import VerifyingKey
    from halo2_tpu.circuit import synthesize_circuit

    K = 11
    N = 1 << K
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
    assembly = Assembly(cs, SimpleNamespace(n=N, k=K), VESTA.scalar)
    synthesize_circuit(assembly, circuit, config, cs.constants)
    cs2, _ = compress_selectors(cs, assembly.selectors)

    j = cs2.degree()
    extended_k = K
    while (1 << extended_k) < N * (j - 1):
        extended_k += 1
    P = VESTA.scalar.modulus
    omega = pow(VESTA.scalar.root_of_unity,
                1 << (VESTA.scalar.s - K), P)
    dom = SimpleNamespace(pinned=lambda: {
        "k": K, "extended_k": extended_k, "omega": omega})
    vk = VerifyingKey(VESTA, dom, gold_fixed, gold_perm, cs2, j)
    assert vk.pinned_text() + "\n" == text


@pytest.mark.parametrize("circuit_cls,name", [
    (EccMirrorCircuit, "ecc_chip"),
    (EccMirror45BCircuit, "ecc_chip_4_5b"),
])
def test_ecc_vk_and_proof_parity(circuit_cls, name):
    """Full vk byte-parity + stored-proof verification against the
    reference's golden artifacts (halo2_gadgets test_circuits)."""
    params = Params.new(VESTA, 11, use_cache=False)
    vk = keygen_vk(params, circuit_cls(False))
    expected = open(os.path.join(GOLDEN, f"vk_{name}.rdata")).read()
    assert vk.pinned_text() + "\n" == expected

    proof = open(os.path.join(GOLDEN, f"proof_{name}.bin"),
                 "rb").read()
    tr = TranscriptRead(VESTA, proof)
    verify_proof(params, vk, SingleVerifier(params), [[]], tr)
