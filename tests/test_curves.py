"""Curve arithmetic: device Jacobian kernels vs exact host group law."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.curves import (PALLAS, VESTA, PALLAS_DEV, JPoint,
                              padd, pdouble, batch_scalar_mul, normalize,
                              tree_sum)

RNG = random.Random(7)


def rand_points(spec, n):
    """Random points as small multiples of the generator."""
    return [spec.mul(spec.generator, RNG.randrange(1, 1 << 64))
            for _ in range(n)]


def test_host_group_law():
    for spec in (PALLAS, VESTA):
        g = spec.generator
        assert spec.is_on_curve(g)
        g2 = spec.double(g)
        assert spec.is_on_curve(g2)
        assert spec.add(g, g) == g2
        assert spec.add(g2, spec.neg(g)) == g
        assert spec.add(g, spec.neg(g)) is None
        assert spec.mul(g, spec.scalar.modulus) is None  # group order
        assert spec.mul(g, 5) == spec.add(g2, spec.add(g2, g))


def test_host_compressed_bytes():
    for spec in (PALLAS, VESTA):
        for pt in [None, spec.generator, spec.mul(spec.generator, 12345)]:
            data = spec.to_bytes(pt)
            assert len(data) == 32
            assert spec.from_bytes(data) == pt


def test_device_add_double_vs_host():
    cv = PALLAS_DEV
    spec = PALLAS
    pts_a = rand_points(spec, 8)
    pts_b = rand_points(spec, 8)
    # edge cases: identity operands, doubling, inverse pair
    pts_a[0] = None
    pts_b[1] = None
    pts_b[2] = pts_a[2]            # doubling case
    pts_b[3] = spec.neg(pts_a[3])  # inverse case -> identity
    da, db = cv.points_to_device(pts_a), cv.points_to_device(pts_b)

    got = cv.points_from_device(normalize(cv, padd(cv, da, db)))
    want = [spec.add(a, b) for a, b in zip(pts_a, pts_b)]
    assert got == want

    got_dbl = cv.points_from_device(normalize(cv, pdouble(cv, da)))
    want_dbl = [spec.double(a) for a in pts_a]
    assert got_dbl == want_dbl


def test_device_scalar_mul():
    cv = PALLAS_DEV
    spec = PALLAS
    pts = rand_points(spec, 4)
    pts[0] = None
    scalars = [RNG.randrange(spec.scalar.modulus) for _ in range(4)]
    scalars[1] = 0
    digits = np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars])
    got = cv.points_from_device(
        normalize(cv, batch_scalar_mul(cv, cv.points_to_device(pts),
                                       jnp.asarray(digits))))
    want = [spec.mul(p, s) for p, s in zip(pts, scalars)]
    assert got == want


def test_tree_sum():
    cv = PALLAS_DEV
    spec = PALLAS
    pts = rand_points(spec, 7)  # odd length exercises padding
    acc = None
    for p in pts:
        acc = spec.add(acc, p)
    got = cv.points_from_device(
        normalize(cv, tree_sum(cv, cv.points_to_device(pts), axis=0)))
    # tree_sum returns a single point (shape ()); normalize handles it
    assert got == [acc]
