"""Golden vk-text + proof regression (the reference's stored-artifact
strategy: halo2_gadgets/src/test_circuits/test_utils.rs:17-111 and
tests/plonk_api.rs:444-608).

Artifacts live in tests/golden/; regenerate with
HALO2_TPU_GENERATE_NEW_DATA=1 python -m pytest tests/test_golden.py.
The proof is generated with a FIXED rng stream, so these artifacts pin
the full transcript byte layout against regressions."""
import os
import random

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.poly import Params
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier)
from halo2_tpu.transcript import TranscriptRead, TranscriptWrite

from test_plonk_e2e import MulCircuit

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
VK_PATH = os.path.join(GOLDEN_DIR, "vk_mul_circuit.txt")
PROOF_PATH = os.path.join(GOLDEN_DIR, "proof_mul_circuit.bin")
K = 4
GENERATE = os.environ.get("HALO2_TPU_GENERATE_NEW_DATA") == "1"


@pytest.fixture(scope="module")
def setup():
    params = Params.new(PALLAS, K, use_cache=False)
    fs = PALLAS.scalar
    circuit = MulCircuit(7, 191)
    out = fs.mul(7, 191)
    vk = keygen_vk(params, circuit)
    return params, circuit, vk, out


def test_pinned_vk_text(setup):
    params, circuit, vk, out = setup
    text = vk.pinned_text()
    if GENERATE or not os.path.exists(VK_PATH):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(VK_PATH, "w") as fh:
            fh.write(text)
    with open(VK_PATH) as fh:
        assert fh.read() == text, (
            "pinned vk text changed — consensus-relevant layout or "
            "commitment change; regenerate only if intentional")


def test_stored_proof_verifies(setup):
    params, circuit, vk, out = setup
    pk = keygen_pk(params, vk, circuit)
    if GENERATE or not os.path.exists(PROOF_PATH):
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [[[out]]],
                     random.Random(0xC0FFEE), tw)
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(PROOF_PATH, "wb") as fh:
            fh.write(tw.finalize())
    with open(PROOF_PATH, "rb") as fh:
        proof = fh.read()
    tr = TranscriptRead(PALLAS, proof)
    verify_proof(params, vk, SingleVerifier(params), [[[out]]], tr)

    # byte-reproducibility under the fixed rng stream
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk, [circuit], [[[out]]],
                 random.Random(0xC0FFEE), tw)
    assert tw.finalize() == proof, (
        "proof bytes changed under the fixed RNG stream — transcript "
        "layout regression")
