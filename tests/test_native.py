"""Native C++ host-curve library (halo2_tpu/native/pasta.cc) vs the
pure-Python Jacobian oracle in curves/host.py.

The native library accelerates host-side group algebra (keygen
commitments, verifier final MSM, IPA G' collapse) the way the
reference's compute layer is native Rust (halo2_proofs/src/arithmetic.rs
best_multiexp); results must be bit-identical to the Python path.
"""
import os
import random

import pytest

from halo2_tpu.curves.host import PALLAS, VESTA
from halo2_tpu.curves import native


def _points(spec, n, rng):
    g = spec.generator
    acc = g
    pts = []
    for i in range(n):
        pts.append(acc if i % 9 else None)  # sprinkle infinities
        acc = spec.add(acc, g)
    return pts


@pytest.mark.parametrize("spec", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_native_msm_matches_python(spec):
    if native._load() is None:
        pytest.skip("no native toolchain")
    rng = random.Random(7)
    for n in (9, 64, 257):
        pts = _points(spec, n, rng)
        scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
        scalars[0] = 0
        scalars[1] = 1
        scalars[2] = spec.scalar.modulus - 1
        os.environ["HALO2_TPU_NO_NATIVE"] = "1"
        try:
            ref = spec.msm(scalars, pts)
        finally:
            del os.environ["HALO2_TPU_NO_NATIVE"]
        got = native.native_msm(spec, scalars, pts)
        assert got == ref


@pytest.mark.parametrize("spec", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_native_collapse_matches_python(spec):
    if native._load() is None:
        pytest.skip("no native toolchain")
    rng = random.Random(11)
    pts = _points(spec, 40, rng)
    lo, hi = pts[:20], pts[20:]
    for k in (0, 1, rng.randrange(spec.scalar.modulus),
              spec.scalar.modulus - 1):
        got = native.native_collapse(spec, k, lo, hi)
        ref = [h_scaled if l is None else
               (l if h_scaled is None else spec.add(l, h_scaled))
               for l, h_scaled in
               ((l, spec.mul(h, k) if h is not None else None)
                for l, h in zip(lo, hi))]
        assert got == ref


def test_native_msm_empty_and_all_zero():
    if native._load() is None:
        pytest.skip("no native toolchain")
    spec = PALLAS
    pts = _points(spec, 12, random.Random(3))
    assert native.native_msm(spec, [0] * 12, pts) is None


def test_native_ipa_session_matches_oracle_proof_bytes():
    """The native IPA tail must be byte-identical to the pure oracle
    path: same circuit, same RNG stream -> same proof bytes."""
    if native._load() is None:
        pytest.skip("no native toolchain")
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_plonk_e2e import MulCircuit
    from halo2_tpu.poly import Params
    from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                                 verify_proof, SingleVerifier)
    from halo2_tpu.transcript import TranscriptWrite, TranscriptRead

    params = Params.new(PALLAS, 5)
    fs = PALLAS.scalar
    circuit = MulCircuit(a=3, b=5)
    pub = fs.mul(3, 5)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)

    def prove(no_native: bool) -> bytes:
        if no_native:
            os.environ["HALO2_TPU_NO_NATIVE"] = "1"
        else:
            os.environ.pop("HALO2_TPU_NO_NATIVE", None)
        try:
            rng = random.Random(42)
            t = TranscriptWrite(PALLAS)
            create_proof(params, pk, [circuit], [[[pub]]], rng, t)
            return t.finalize()
        finally:
            os.environ.pop("HALO2_TPU_NO_NATIVE", None)

    p_native = prove(False)
    p_oracle = prove(True)
    assert p_native == p_oracle
    t = TranscriptRead(PALLAS, p_native)
    verify_proof(params, vk, SingleVerifier(params), [[[pub]]], t)  # raises


def test_native_hash_to_curve_matches_python_oracle():
    """Native SSWU (BLAKE2b expand + map + isogeny) must be byte-exact
    against the derived pure-Python map in curves/sswu.py."""
    if native._load() is None:
        pytest.skip("no native toolchain")
    from halo2_tpu.curves.sswu import sswu_params
    from halo2_tpu.curves import VESTA
    for curve in (PALLAS, VESTA):
        oracle = sswu_params(curve.name)
        for msg in (b"\x01", b"\x02", b"",
                    b"\x00" + (0).to_bytes(4, "little"),
                    b"\x00" + (12345).to_bytes(4, "little")):
            want = oracle.hash_to_curve("Halo2-Parameters", msg)
            got = native.native_hash_to_curve(curve, "Halo2-Parameters",
                                              msg)
            assert got == want


def test_native_srs_g_matches_python_oracle():
    if native._load() is None:
        pytest.skip("no native toolchain")
    from halo2_tpu.curves.sswu import sswu_params
    n = 64
    g = native.native_srs_g(PALLAS, "Halo2-Parameters", n)
    oracle = sswu_params("pallas")
    for i in (0, 1, 31, 63):
        want = oracle.hash_to_curve(
            "Halo2-Parameters", b"\x00" + i.to_bytes(4, "little"))
        assert g[i] == want


def test_native_group_ntt_matches_host_intt():
    """The native group-valued iNTT must match the exact host butterfly
    path used for g_lagrange (commitment.rs:75-100)."""
    if native._load() is None:
        pytest.skip("no native toolchain")
    from halo2_tpu.poly.commitment import Params
    k = 4
    n = 1 << k
    fs = PALLAS.scalar
    g = [PALLAS.mul(PALLAS.generator, i + 3) for i in range(n)]
    omega = pow(fs.root_of_unity, 1 << (fs.s - k), fs.modulus)
    omega_inv = pow(omega, fs.modulus - 2, fs.modulus)
    minv = pow(n, fs.modulus - 2, fs.modulus)
    want = Params._host_group_intt(PALLAS, g, omega_inv, minv)
    got = native.native_group_ntt(PALLAS, g, omega_inv, minv)
    assert got == want


@pytest.mark.parametrize("spec", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_native_msm_many_matches_python(spec):
    """pasta_msm_many (the commit_many host path: m MSMs over one
    pre-packed point set, raw or Montgomery scalars) vs the pure-Python
    oracle."""
    if native._load() is None:
        pytest.skip("no native toolchain")
    import numpy as np
    rng = random.Random(11)
    q = spec.scalar.modulus
    n, m = 65, 3
    pts = _points(spec, n, rng)
    packed = native.PackedPoints(spec, pts)
    rows = [[rng.randrange(q) for _ in range(n)] for _ in range(m)]
    rows[1][4] = 0
    os.environ["HALO2_TPU_NO_NATIVE"] = "1"
    try:
        want = [spec.msm(r, pts) for r in rows]
    finally:
        del os.environ["HALO2_TPU_NO_NATIVE"]
    raw = np.stack([native.ints_to_limbs(r) for r in rows])
    assert native.native_msm_many(spec, raw, packed, False) == want
    R = 1 << 256
    mont = np.stack([native.ints_to_limbs([v * R % q for v in r])
                     for r in rows])
    assert native.native_msm_many(spec, mont, packed, True) == want


@pytest.mark.parametrize("spec", [PALLAS, VESTA], ids=["pallas", "vesta"])
def test_native_decompress_many_matches_python(spec):
    """pasta_decompress_many (batch SRS point deserialization) vs the
    per-point Python from_bytes oracle, incl. identity and both y
    parities."""
    if native._load() is None:
        pytest.skip("no native toolchain")
    rng = random.Random(21)
    pts = [spec.mul(spec.generator, rng.randrange(1, 10 ** 9))
           for _ in range(31)]
    pts += [(x, spec.base.modulus - y) for x, y in pts[:5]]  # flip parity
    pts.append(None)
    data = b"".join(spec.to_bytes(p) for p in pts)
    got = native.native_decompress_many(spec, data)
    assert got is not False and got == pts
    oracle = [spec.from_bytes(data[i * 32:(i + 1) * 32])
              for i in range(len(pts))]
    assert got == oracle
