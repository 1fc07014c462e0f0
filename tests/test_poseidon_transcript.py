"""Poseidon (algebraic) transcript: self-consistent prove/verify with
the same wire format as Blake2b (transcript.rs:23-62 hash-agnosticism)."""
import random

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import (TranscriptWrite, PoseidonTranscriptWrite,
                                  PoseidonTranscriptRead)
from halo2_tpu.poly import Params
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier,
                             VerificationError)

from tests.test_plonk_e2e import MulCircuit

K = 4
FS = PALLAS.scalar


@pytest.fixture(scope="module")
def setup():
    params = Params.new(PALLAS, K, use_cache=False)
    circuit = MulCircuit(7, 191)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk, circuit


def _prove(params, pk, circuit, inst, cls, seed=42):
    tw = cls(PALLAS)
    create_proof(params, pk, [circuit], [inst], random.Random(seed), tw)
    return tw.finalize()


def test_poseidon_transcript_roundtrip(setup):
    params, vk, pk, circuit = setup
    out = FS.mul(7, 191)
    proof = _prove(params, pk, circuit, [[out]], PoseidonTranscriptWrite)

    tr = PoseidonTranscriptRead(PALLAS, proof)
    verify_proof(params, vk, SingleVerifier(params), [[[out]]], tr)

    with pytest.raises(VerificationError):
        tr_bad = PoseidonTranscriptRead(PALLAS, proof)
        verify_proof(params, vk, SingleVerifier(params), [[[out + 1]]],
                     tr_bad)


def test_poseidon_transcript_deterministic_and_same_size(setup):
    params, vk, pk, circuit = setup
    out = FS.mul(7, 191)
    p1 = _prove(params, pk, circuit, [[out]], PoseidonTranscriptWrite)
    p2 = _prove(params, pk, circuit, [[out]], PoseidonTranscriptWrite)
    assert p1 == p2  # deterministic with a fixed RNG

    blake = _prove(params, pk, circuit, [[out]], TranscriptWrite)
    assert len(p1) == len(blake)  # identical wire format
    assert p1 != blake            # different challenge schedule


def test_poseidon_challenges_ratchet():
    """Consecutive squeezes differ; absorbed data gates challenges."""
    t1 = PoseidonTranscriptWrite(PALLAS)
    a = t1.squeeze_challenge()
    b = t1.squeeze_challenge()
    assert a != b

    t2 = PoseidonTranscriptWrite(PALLAS)
    t2.common_scalar(123)
    c = t2.squeeze_challenge()
    assert c not in (a, b)

    # same absorption sequence => same challenge
    t3 = PoseidonTranscriptWrite(PALLAS)
    t3.common_scalar(123)
    assert t3.squeeze_challenge() == c
