"""End-to-end PLONK prove/verify tests (the reference's plonk_api.rs /
prover.rs:727-786 analogues)."""
import random

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import TranscriptRead, TranscriptWrite
from halo2_tpu.poly import Params
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier,
                             AccumulatorStrategy, BatchVerifier,
                             VerificationError)

K = 4
RNG = random.Random(2024)


@pytest.fixture(scope="module")
def params():
    return Params.new(PALLAS, K, use_cache=False)


class EmptyCircuit(Circuit):
    """Gate-less circuit: exercises vanishing + multiopen + IPA only
    (reference proves this in prover.rs:727-786)."""

    def without_witnesses(self):
        return EmptyCircuit()

    @classmethod
    def configure(cls, meta):
        return None

    def synthesize(self, config, layouter):
        pass


class MulCircuit(Circuit):
    """out = a * b with the product exposed via an instance column.
    Exercises gates, permutation (copy to instance), blinding."""

    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def without_witnesses(self):
        return MulCircuit()

    @classmethod
    def configure(cls, meta):
        col_a = meta.advice_column()
        col_b = meta.advice_column()
        instance = meta.instance_column()
        s_mul = meta.selector()
        meta.enable_equality(col_a)
        meta.enable_equality(instance)

        def gate(cells):
            a = cells.query_advice(col_a, Rotation(0))
            b = cells.query_advice(col_b, Rotation(0))
            out = cells.query_advice(col_a, Rotation(1))
            s = cells.query_selector(s_mul)
            return [("mul", s * (a * b - out))]

        meta.create_gate("mul", gate)
        return {"a": col_a, "b": col_b, "instance": instance,
                "s_mul": s_mul}

    def synthesize(self, config, layouter):
        fs = PALLAS.scalar

        def region_fn(region):
            region.enable_selector("s", config["s_mul"], 0)
            region.assign_advice("a", config["a"], 0,
                                 lambda: Value.known(self.a))
            region.assign_advice("b", config["b"], 0,
                                 lambda: Value.known(self.b))
            out = region.assign_advice(
                "out", config["a"], 1,
                lambda: Value.known(fs.mul(self.a, self.b)))
            return out

        out = layouter.assign_region("mul", region_fn)
        layouter.constrain_instance(out.cell, config["instance"], 0)


def _prove(params, pk, circuit, instances):
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk, [circuit], [instances], RNG, tw)
    return tw.finalize()


def _verify(params, vk, proof, instances, strategy=None):
    tr = TranscriptRead(PALLAS, proof)
    strategy = strategy or SingleVerifier(params)
    return verify_proof(params, vk, strategy, [instances], tr)


def test_empty_circuit_roundtrip(params):
    circuit = EmptyCircuit()
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    proof = _prove(params, pk, circuit, [])
    _verify(params, vk, proof, [])  # raises on failure


def test_mul_circuit_roundtrip(params):
    fs = PALLAS.scalar
    a, b = 7, 191
    circuit = MulCircuit(a, b)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    out = fs.mul(a, b)
    proof = _prove(params, pk, circuit, [[out]])
    _verify(params, vk, proof, [[out]])

    # wrong public input must fail
    with pytest.raises(VerificationError):
        _verify(params, vk, proof, [[out + 1]])

    # corrupted proof must fail
    bad = bytearray(proof)
    bad[7] ^= 0x40
    with pytest.raises(Exception):
        _verify(params, vk, proof=bytes(bad), instances=[[out]])


def test_mul_circuit_accumulator_and_batch(params):
    fs = PALLAS.scalar
    a, b = 3, 5
    circuit = MulCircuit(a, b)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    out = fs.mul(a, b)
    proof = _prove(params, pk, circuit, [[out]])

    acc = _verify(params, vk, proof, [[out]],
                  strategy=AccumulatorStrategy(params))
    assert acc.g is not None and len(acc.u_packed) == K

    batch = BatchVerifier(params)
    batch.add_proof([[[out]]], proof)
    proof2 = _prove(params, pk, MulCircuit(2, 13), [[fs.mul(2, 13)]])
    batch.add_proof([[[fs.mul(2, 13)]]], proof2)
    assert batch.finalize(vk)


def test_multi_circuit_proof(params):
    """Several circuit instances batched into ONE proof (the reference's
    create_proof takes circuits: &[C] — prover.rs:35-56)."""
    fs = PALLAS.scalar
    c1, c2 = MulCircuit(3, 4), MulCircuit(5, 6)
    vk = keygen_vk(params, c1)
    pk = keygen_pk(params, vk, c1)
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk, [c1, c2], [[[12]], [[30]]], RNG, tw)
    proof = tw.finalize()
    tr = TranscriptRead(PALLAS, proof)
    verify_proof(params, vk, SingleVerifier(params), [[[12]], [[30]]], tr)
    with pytest.raises(VerificationError):
        tr2 = TranscriptRead(PALLAS, proof)
        verify_proof(params, vk, SingleVerifier(params),
                     [[[12]], [[31]]], tr2)
