"""Pallas-point-kernel MSM: correctness vs the host oracle.

Reference behavior: `best_multiexp` (halo2_proofs/src/arithmetic.rs:143-180);
the group law is exact so any schedule must give the identical point
(`test_multiexp`, arithmetic.rs:440-458). On CPU these run through the
interpret/jnp fallback path of ops/pallas_point.py; the TPU Pallas path is
exercised by scripts/bench_msm_tpu.py and bench.py on the attached chip.
"""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.curves.host import PALLAS, VESTA
from halo2_tpu.fields.device import FP_DEV, FQ_DEV
from halo2_tpu.ops.pallas_point import (
    points_to_proj, points_from_proj, padd_flat, pdouble_flat,
    padd_masked_flat, pdouble_masked_flat)
from halo2_tpu.ops.msm_pallas import (
    msm_pallas, window_digits, pick_c, host_horner_combine,
    device_horner_combine, msm_pallas_window_sums,
    _host_proj_add, _host_proj_double)


def _digits16(scalars):
    return jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))


def test_host_projective_formulas():
    spec = PALLAS
    p = spec.base.modulus
    rng = random.Random(1)
    for _ in range(4):
        a = spec.mul(spec.generator, rng.randrange(1, spec.scalar.modulus))
        b = spec.mul(spec.generator, rng.randrange(1, spec.scalar.modulus))
        for bb in (b, a, None):
            pa = (a[0], a[1], 1)
            pb = (bb[0], bb[1], 1) if bb else (0, 1, 0)
            X, Y, Z = _host_proj_add(p, pa, pb)
            exp = spec.add(a, bb)
            if Z == 0:
                assert exp is None
            else:
                zi = pow(Z, -1, p)
                assert (X * zi % p, Y * zi % p) == exp
        X, Y, Z = _host_proj_double(p, (a[0], a[1], 1))
        zi = pow(Z, -1, p)
        assert (X * zi % p, Y * zi % p) == spec.double(a)


@pytest.mark.parametrize("spec,df", [(PALLAS, FP_DEV), (VESTA, FQ_DEV)])
def test_point_kernels(spec, df):
    pts_a = [spec.mul(spec.generator, i + 1) for i in range(7)] + [None]
    pts_b = [spec.mul(spec.generator, 3 * i + 2) for i in range(6)] \
        + [None, pts_a[0]]
    A = points_to_proj(spec, df, pts_a)
    B = points_to_proj(spec, df, pts_b)
    out = points_from_proj(spec, df, padd_flat(df, A, B))
    assert out == [spec.add(x, y) for x, y in zip(pts_a, pts_b)]
    # doubling, including the a+a degenerate case of the complete law
    assert points_from_proj(spec, df, pdouble_flat(df, A)) == \
        [spec.double(x) for x in pts_a]
    assert points_from_proj(spec, df, padd_flat(df, A, A)) == \
        [spec.double(x) for x in pts_a]
    mask = jnp.asarray(np.array([1, 0] * 4, np.uint32))
    out4 = points_from_proj(spec, df, padd_masked_flat(df, A, B, mask))
    assert out4 == [spec.add(x, y) if m else x
                    for x, y, m in zip(pts_a, pts_b, [1, 0] * 4)]
    out5 = points_from_proj(spec, df, pdouble_masked_flat(df, A, mask))
    assert out5 == [spec.double(x) if m else x
                    for x, m in zip(pts_a, [1, 0] * 4)]


def test_window_digits_roundtrip():
    rng = random.Random(3)
    scalars = [rng.randrange(1 << 255) for _ in range(17)] + [0]
    for c in (4, 7, 13):
        d = np.asarray(window_digits(_digits16(scalars), c))
        W = -(-256 // c)
        assert d.shape == (W, len(scalars))
        for j, s in enumerate(scalars):
            v = 0
            for w in range(W):
                v |= int(d[w, j]) << (c * w)
            assert v == s


@pytest.mark.parametrize("n", [8, 100, 300])
def test_msm_pallas_matches_oracle(n):
    spec, df = PALLAS, FP_DEV
    rng = random.Random(7 + n)
    pts = [spec.mul(spec.generator, rng.randrange(1, 100000))
           for _ in range(n)]
    pts[3] = None
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    scalars[5] = 0
    P = points_to_proj(spec, df, pts)
    got = msm_pallas(spec, df, _digits16(scalars), P)
    assert got == spec.msm(scalars, pts)


def test_device_horner_matches_host():
    spec, df = PALLAS, FP_DEV
    rng = random.Random(11)
    n = 64
    pts = [spec.mul(spec.generator, rng.randrange(1, 100000))
           for _ in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    P = points_to_proj(spec, df, pts)
    wsums, c = msm_pallas_window_sums(spec, df, _digits16(scalars), P)
    host_res = host_horner_combine(spec, points_from_proj(spec, df, wsums), c)
    dev = device_horner_combine(df, wsums, c)
    dev_res = points_from_proj(spec, df, dev[:, None])[0]
    assert host_res == dev_res == spec.msm(scalars, pts)


def test_msm_dispatch_uses_pallas_path(monkeypatch):
    """ops/msm.py routes sizes above PALLAS_MSM_THRESHOLD through the
    Pallas Pippenger and the result matches the host oracle."""
    import importlib
    msm_mod = importlib.import_module("halo2_tpu.ops.msm")
    from halo2_tpu.curves import PALLAS_DEV
    monkeypatch.setattr(msm_mod, "HOST_MSM_THRESHOLD", 0)
    monkeypatch.setattr(msm_mod, "PALLAS_MSM_THRESHOLD", 16)
    spec = PALLAS
    cv = PALLAS_DEV
    rng = random.Random(23)
    n = 60
    pts = [spec.mul(spec.generator, rng.randrange(1, 100000))
           for _ in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    jp = cv.points_to_device(pts)
    out = msm_mod.msm(cv, _digits16(scalars), jp)
    from halo2_tpu.curves.device import JPoint
    got = cv.points_from_device(
        JPoint(out.x[None], out.y[None], out.z[None]))[0]
    assert got == spec.msm(scalars, pts)


def test_msm_pallas_skewed_scalars_scan_branch():
    """Degenerate digit distributions (all-equal scalars, 0/1 selector
    columns) must take the segmented-scan branch and still match the
    host oracle (the serial-run branch would need up to n rounds)."""
    spec = PALLAS
    df = FP_DEV
    n = 256
    rng = random.Random(11)
    pts = [spec.mul(spec.generator, rng.randrange(1, 1 << 62))
           for i in range(n)]
    a = rng.randrange(spec.scalar.modulus)
    cases = {
        "all-equal": [a] * n,
        "selector": [rng.randrange(2) for _ in range(n)],
        "two-values": [a if i % 2 else (a * 2) % spec.scalar.modulus
                       for i in range(n)],
    }
    proj = points_to_proj(spec, df, pts)
    for name, scalars in cases.items():
        got = msm_pallas(spec, df, _digits16(scalars), proj)
        assert got == spec.msm(scalars, pts), name


def test_window_digits_signed_exact():
    """Signed recode telescopes exactly: sum of ±abs·2^(c·w) recovers the
    scalar, |digit| <= 2^(c-1), and the top window never recodes."""
    import random
    import numpy as np
    import jax.numpy as jnp
    from halo2_tpu.ops.msm_pallas import window_digits_signed

    rng = random.Random(5)
    fs_mod = (1 << 255) - 19  # any <2^255 bound exercises the telescope
    vals = [0, 1, fs_mod - 1, (1 << 255) - 1] + [
        rng.randrange(1 << 255) for _ in range(60)]
    d16 = jnp.asarray(np.stack([
        np.array([(v >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for v in vals]))
    for c in (4, 8, 9, 13):
        absd, signs = window_digits_signed(d16, c)
        a = np.asarray(absd).astype(np.int64)
        s = np.asarray(signs).astype(np.int64)
        assert int(a.max()) <= 1 << (c - 1)
        W = a.shape[0]
        for j, v in enumerate(vals):
            rec = sum((1 - 2 * int(s[w, j])) * int(a[w, j]) << (c * w)
                      for w in range(W))
            assert rec == v, (c, j)
