"""Field arithmetic tests: device limb kernels vs exact host integers.

Mirrors the role of pasta_curves' field test vectors (the reference's L0
substrate, SURVEY.md §1 L0)."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.fields import (FP, FQ, FP_DEV, FQ_DEV, fadd, fsub, fmul,
                              fneg, fpow, finv, batch_inv, from_mont,
                              batch_invert)
from halo2_tpu.fields.device import limbs_to_int, int_to_limbs, R

RNG = random.Random(0xC0FFEE)


def rand_elems(spec, n):
    return [RNG.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec,dev", [(FP, FP_DEV), (FQ, FQ_DEV)])
def test_roundtrip_and_mont(spec, dev):
    vals = rand_elems(spec, 8) + [0, 1, spec.modulus - 1]
    arr = dev.to_mont_np(vals)
    back = dev.from_mont_np(arr)
    assert [int(x) for x in back] == [v % spec.modulus for v in vals]


@pytest.mark.parametrize("spec,dev", [(FP, FP_DEV), (FQ, FQ_DEV)])
def test_add_sub_mul(spec, dev):
    n = 64
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    # include edge cases
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1
    a[1], b[1] = 0, 0
    da, db = jnp.asarray(dev.to_mont_np(a)), jnp.asarray(dev.to_mont_np(b))

    got_add = dev.from_mont_np(np.asarray(fadd(dev, da, db)))
    got_sub = dev.from_mont_np(np.asarray(fsub(dev, da, db)))
    got_mul = dev.from_mont_np(np.asarray(fmul(dev, da, db)))
    got_neg = dev.from_mont_np(np.asarray(fneg(dev, da)))
    for i in range(n):
        assert int(got_add[i]) == (a[i] + b[i]) % spec.modulus
        assert int(got_sub[i]) == (a[i] - b[i]) % spec.modulus
        assert int(got_mul[i]) == (a[i] * b[i]) % spec.modulus
        assert int(got_neg[i]) == (-a[i]) % spec.modulus


@pytest.mark.parametrize("spec,dev", [(FP, FP_DEV)])
def test_pow_inv(spec, dev):
    n = 8
    a = rand_elems(spec, n)
    da = jnp.asarray(dev.to_mont_np(a))
    got_sq = dev.from_mont_np(np.asarray(fpow(dev, da, 5)))
    for i in range(n):
        assert int(got_sq[i]) == pow(a[i], 5, spec.modulus)
    got_inv = dev.from_mont_np(np.asarray(finv(dev, da)))
    for i in range(n):
        assert a[i] * int(got_inv[i]) % spec.modulus == 1


@pytest.mark.parametrize("spec,dev", [(FP, FP_DEV)])
def test_batch_inv_with_zeros(spec, dev):
    n = 33  # odd length to catch scan padding issues
    a = rand_elems(spec, n)
    a[3] = 0
    a[17] = 0
    da = jnp.asarray(dev.to_mont_np(a))
    got = dev.from_mont_np(np.asarray(batch_inv(dev, da, axis=0)))
    expect = batch_invert(spec, a)
    assert [int(x) for x in got] == expect


def test_field_constants():
    # 2-adic root of unity has exact order 2^32
    for spec in (FP, FQ):
        w = spec.root_of_unity
        assert pow(w, 1 << 32, spec.modulus) == 1
        assert pow(w, 1 << 31, spec.modulus) != 1
        z = spec.zeta
        assert pow(z, 3, spec.modulus) == 1 and z != 1
        assert spec.two_inv * 2 % spec.modulus == 1
        # delta generates the odd-order subgroup: delta^t == 1
        assert pow(spec.delta, spec.t_odd, spec.modulus) == 1


def test_sqrt():
    for spec in (FP, FQ):
        for v in rand_elems(spec, 4):
            sq = v * v % spec.modulus
            r = spec.sqrt(sq)
            assert r is not None and r * r % spec.modulus == sq


@pytest.mark.parametrize("spec,dev", [(FP, FP_DEV), (FQ, FQ_DEV)])
def test_rolled_matches_unrolled(spec, dev):
    """The loop-rolled limb kernels (CPU-backend default; see
    fields/device.py::_rolled) must be bit-identical to the unrolled
    straight-line form used on TPU."""
    from halo2_tpu.fields.device import (_mont_mul, _mont_mul_rolled,
                                         _fadd_impl, _fsub_impl)
    import os
    n = 33
    a = rand_elems(spec, n)
    b = rand_elems(spec, n)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1
    a[1], b[1] = 0, 1
    da, db = jnp.asarray(dev.to_mont_np(a)), jnp.asarray(dev.to_mont_np(b))
    assert (np.asarray(_mont_mul_rolled(dev, da, db))
            == np.asarray(_mont_mul(dev, da, db))).all()
    old = os.environ.get("HALO2_TPU_ROLLED")
    try:
        os.environ["HALO2_TPU_ROLLED"] = "1"
        add_r = np.asarray(_fadd_impl(dev, da, db))
        sub_r = np.asarray(_fsub_impl(dev, da, db))
        os.environ["HALO2_TPU_ROLLED"] = "0"
        assert (np.asarray(_fadd_impl(dev, da, db)) == add_r).all()
        assert (np.asarray(_fsub_impl(dev, da, db)) == sub_r).all()
    finally:
        if old is None:
            os.environ.pop("HALO2_TPU_ROLLED", None)
        else:
            os.environ["HALO2_TPU_ROLLED"] = old
