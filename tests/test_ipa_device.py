"""Device IPA tail (ops/ipa_device.py): GLV split correctness and
byte-parity of the fully-on-device IPA open against the native-host
tail (commitment/prover.rs:100-166 — group math is exact, so the two
paths must emit identical transcripts)."""
import random

import pytest

from halo2_tpu.curves import PALLAS, VESTA
from halo2_tpu.fields import FP, FQ
from halo2_tpu.ops.ipa_device import glv_split, _find_lambda, GLV_BITS

from tests.test_plonk_e2e import MulCircuit


@pytest.mark.parametrize("curve,fs", [(PALLAS, FQ), (VESTA, FP)])
def test_glv_split_roundtrip(curve, fs):
    lam = _find_lambda(curve.name, fs.modulus, fs.zeta)
    # endomorphism law on a non-generator point too
    P = curve.mul(curve.generator, 12345)
    assert curve.mul(P, lam) == (curve.base.zeta * P[0] % curve.base.modulus,
                                 P[1])
    rng = random.Random(9)
    for _ in range(20):
        u = rng.randrange(1, fs.modulus)
        s1, n1, s2, n2 = glv_split(fs, curve.name, u)
        assert s1 < (1 << GLV_BITS) and s2 < (1 << GLV_BITS)
        u1 = -s1 if n1 else s1
        u2 = -s2 if n2 else s2
        assert (u1 + u2 * lam - u) % fs.modulus == 0


def test_device_ipa_matches_native_tail(monkeypatch):
    """Same circuit, same RNG: proof bytes from the all-device IPA tail
    must equal the native-host tail's."""
    from halo2_tpu.poly import Params
    from halo2_tpu.transcript import TranscriptWrite, TranscriptRead
    from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                                 verify_proof, SingleVerifier)

    K = 6
    params = Params.new(PALLAS, K, use_cache=False)
    fs = PALLAS.scalar
    circuit = MulCircuit(11, 13)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    out = fs.mul(11, 13)

    def prove():
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [[[out]]], random.Random(4),
                     tw)
        return tw.finalize()

    native = prove()  # default: native tail

    # force the device tail for every round (threshold 0 disables the
    # native session; the CPU backend runs the Pallas kernels in
    # interpret mode)
    monkeypatch.setenv("HALO2_TPU_NATIVE_IPA_THRESHOLD", "0")
    device = prove()
    assert device == native

    # hybrid (the accelerator default shape): big rounds device, then a
    # mid-stream handoff of the collapsed G' to the native session
    monkeypatch.setenv("HALO2_TPU_NATIVE_IPA_THRESHOLD", "8")
    hybrid = prove()
    assert hybrid == native

    tr = TranscriptRead(PALLAS, device)
    verify_proof(params, vk, SingleVerifier(params), [[[out]]], tr)


def test_device_ipa_multi_bucket_transition(monkeypatch):
    """Force several fold+LR bucket widths in one open (tail width 64 at
    K=9 gives buckets [256, 64]) so the bucket-transition masking/padding
    is exercised; transcripts must still match the native tail."""
    import random
    from halo2_tpu.poly import Params
    from halo2_tpu.transcript import TranscriptWrite, TranscriptRead
    from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                                 verify_proof, SingleVerifier)

    K = 9
    params = Params.new(PALLAS, K, use_cache=False)
    fs = PALLAS.scalar
    circuit = MulCircuit(7, 9)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    out = fs.mul(7, 9)

    def prove():
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [[[out]]], random.Random(8),
                     tw)
        return tw.finalize()

    native = prove()

    monkeypatch.setenv("HALO2_TPU_NATIVE_IPA_THRESHOLD", "0")
    monkeypatch.setenv("HALO2_TPU_IPA_TAIL_WF", "64")
    from halo2_tpu.ops.ipa_device import bucket_widths
    assert len(bucket_widths(1 << K)) >= 2  # multi-bucket shape forced
    device = prove()
    assert device == native

    tr = TranscriptRead(PALLAS, device)
    verify_proof(params, vk, SingleVerifier(params), [[[out]]], tr)
