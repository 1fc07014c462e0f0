"""Pow5 Poseidon chip: in-circuit permutation/hash must agree with the
(reference-bit-exact) primitive, checked via MockProver
(halo2_gadgets/src/poseidon/pow5.rs tests)."""
from halo2_tpu.fields import FQ
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.dev import MockProver
from halo2_tpu.gadgets.poseidon import (P128Pow5T3, poseidon_hash,
                                        Pow5Chip, poseidon_hash_gadget)

K = 7
SPEC = P128Pow5T3()


class HashCircuit(Circuit):
    def __init__(self, message=None):
        self.message = message

    def without_witnesses(self):
        return HashCircuit()

    @classmethod
    def configure(cls, meta):
        width = SPEC.t
        state = [meta.advice_column() for _ in range(width)]
        partial_sbox = meta.advice_column()
        rc_a = [meta.fixed_column() for _ in range(width)]
        rc_b = [meta.fixed_column() for _ in range(width)]
        constants = meta.fixed_column()
        meta.enable_constant(constants)
        instance = meta.instance_column()
        meta.enable_equality(instance)
        message_col = meta.advice_column()
        meta.enable_equality(message_col)
        pow5 = Pow5Chip.configure(meta, SPEC, FQ, state, partial_sbox,
                                  rc_a, rc_b)
        return {"pow5": pow5, "instance": instance, "message": message_col}

    def synthesize(self, config, layouter):
        chip = Pow5Chip(config["pow5"])

        def load_message(region):
            cells = []
            for i, m in enumerate(self.message or [None, None]):
                cells.append(region.assign_advice(
                    f"m{i}", config["message"], i,
                    lambda m=m: (Value.known(m) if m is not None
                                 else Value.unknown())))
            return cells

        message = layouter.assign_region("load message", load_message)
        out = poseidon_hash_gadget(chip, layouter, message)
        layouter.constrain_instance(out.cell, config["instance"], 0)


def test_pow5_hash_matches_primitive():
    msg = [123456789, 987654321]
    expected = poseidon_hash(FQ, SPEC, msg)
    prover = MockProver.run(K, HashCircuit(msg), [[expected]], fs=FQ)
    prover.assert_satisfied()


def test_pow5_wrong_output_fails():
    msg = [5, 6]
    expected = poseidon_hash(FQ, SPEC, msg)
    prover = MockProver.run(K, HashCircuit(msg),
                            [[(expected + 1) % FQ.modulus]], fs=FQ)
    assert prover.verify()  # non-empty error list


def test_poseidon_hash_gadget_class():
    """The class-based Sponge/Hash API produces the primitive's value."""
    from halo2_tpu.gadgets.poseidon.gadget import Hash as HashGadget
    from halo2_tpu.gadgets.poseidon import Pow5Chip as _PC

    class HashClassCircuit(HashCircuit):
        def synthesize(self, config, layouter):
            chip = Pow5Chip(config["pow5"])

            def load_message(region):
                return [region.assign_advice(
                    f"m{i}", config["message"], i,
                    lambda m=m: (Value.known(m) if m is not None
                                 else Value.unknown()))
                    for i, m in enumerate(self.message or [None, None])]

            message = layouter.assign_region("load message", load_message)
            out = HashGadget(chip, layouter, 2).hash(message)
            layouter.constrain_instance(out.cell, config["instance"], 0)

    msg = [17, 23]
    expected = poseidon_hash(FQ, SPEC, msg)
    MockProver.run(K, HashClassCircuit(msg), [[expected]],
                   fs=FQ).assert_satisfied()
