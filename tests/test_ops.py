"""NTT and MSM device kernels vs exact host references
(oracles: arithmetic.rs test_multiexp / best_fft semantics)."""
import random

import numpy as np
import jax.numpy as jnp

from halo2_tpu.fields import FP, FQ, FP_DEV, FQ_DEV
from halo2_tpu.curves import PALLAS, PALLAS_DEV, normalize
from halo2_tpu.ops import make_plan, make_inv_plan, ntt, intt, msm, group_ntt

RNG = random.Random(42)


def host_ntt(spec, coeffs, omega):
    n = len(coeffs)
    return [sum(c * pow(omega, i * j, spec.modulus) for j, c in
                enumerate(coeffs)) % spec.modulus for i in range(n)]


def test_ntt_roundtrip_vs_host():
    spec, dev = FP, FP_DEV
    k = 4
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.modulus)
    coeffs = [RNG.randrange(spec.modulus) for _ in range(n)]
    plan = make_plan(dev, n, omega)
    da = jnp.asarray(dev.to_mont_np(coeffs))
    evals = dev.from_mont_np(np.asarray(ntt(dev, da, plan)))
    assert [int(x) for x in evals] == host_ntt(spec, coeffs, omega)

    inv_plan, n_inv = make_inv_plan(dev, plan)
    back = dev.from_mont_np(np.asarray(intt(dev, ntt(dev, da, plan),
                                            inv_plan, n_inv)))
    assert [int(x) for x in back] == coeffs


def test_msm_vs_host(monkeypatch):
    import importlib
    msm_mod = importlib.import_module("halo2_tpu.ops.msm")
    monkeypatch.setattr(msm_mod, "HOST_MSM_THRESHOLD", 0)  # force device
    spec, cv = PALLAS, PALLAS_DEV
    n = 37  # deliberately not a power of two
    pts = [spec.mul(spec.generator, RNG.randrange(1, 1 << 128))
           for _ in range(n)]
    pts[5] = None
    scalars = [RNG.randrange(spec.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = spec.scalar.modulus - 1

    digits = np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars])
    got = cv.points_from_device(
        normalize(cv, msm(cv, jnp.asarray(digits),
                          cv.points_to_device(pts))))
    want = spec.msm(scalars, pts)
    assert got == [want]


def test_group_ntt_small():
    spec, cv = PALLAS, PALLAS_DEV
    dev = FQ_DEV  # scalar field of pallas
    k = 3
    n = 1 << k
    fs = spec.scalar  # NTT over the scalar field acting on points
    omega = pow(fs.root_of_unity, 1 << (fs.s - k), fs.modulus)
    pts = [spec.mul(spec.generator, RNG.randrange(1, 1 << 64))
           for _ in range(n)]
    plan = make_plan(dev, n, omega)
    got = cv.points_from_device(
        normalize(cv, group_ntt(cv, cv.points_to_device(pts), plan)))
    # host reference: NTT with point "+" and scalar "*"
    want = []
    for i in range(n):
        acc = None
        for j, pt in enumerate(pts):
            acc = spec.add(acc, spec.mul(pt, pow(omega, i * j, fs.modulus)))
        want.append(acc)
    assert got == want


import os
import pytest


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="windowed-MSM device path compile is slow on "
                           "CPU; run with RUN_SLOW=1 (validated on TPU)")
def test_msm_pippenger_window_path(monkeypatch):
    """Force the sort+segmented-scan Pippenger path on a small input and
    check against the host reference."""
    import importlib
    msm_mod = importlib.import_module("halo2_tpu.ops.msm")
    monkeypatch.setattr(msm_mod, "HOST_MSM_THRESHOLD", 0)
    monkeypatch.setattr(msm_mod, "SMALL_MSM_THRESHOLD", 0)
    spec, cv = PALLAS, PALLAS_DEV
    n = 16
    pts = [spec.mul(spec.generator, RNG.randrange(1, 1 << 64))
           for _ in range(n)]
    scalars = [RNG.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars])
    from halo2_tpu.ops.msm import msm as msm_fn
    got = cv.points_from_device(
        normalize(cv, msm_fn(cv, jnp.asarray(digits),
                             cv.points_to_device(pts))))
    assert got == [spec.msm(scalars, pts)]
