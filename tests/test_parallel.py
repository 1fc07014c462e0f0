"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded MSM (all_gather group reduction) and four-step distributed NTT
(all_to_all exchanges) must match the single-device kernels exactly."""
import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from halo2_tpu.fields import FP, FQ, FQ_DEV
from halo2_tpu.curves import PALLAS, PALLAS_DEV, normalize
from halo2_tpu.ops import make_plan, ntt
from halo2_tpu.parallel import (make_mesh, sharded_msm, sharded_ntt,
                                ShardedNttPlan)

RNG = random.Random(11)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_msm_matches_host():
    # D=4 keeps the shard_map compile tractable on CPU; the 8-device
    # configuration is exercised by __graft_entry__.dryrun_multichip.
    spec, cv = PALLAS, PALLAS_DEV
    mesh = make_mesh(4)
    n = 16
    pts = [spec.mul(spec.generator, RNG.randrange(1, 1 << 100))
           for _ in range(n)]
    scalars = [RNG.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars])
    got = cv.points_from_device(normalize(cv, sharded_msm(
        cv, mesh, jnp.asarray(digits), cv.points_to_device(pts))))
    assert got == [spec.msm(scalars, pts)]


def test_sharded_ntt_matches_local():
    spec, dev = FQ, FQ_DEV
    mesh = make_mesh(4)
    k = 6  # n=64, D^2=16 | 64
    n = 1 << k
    omega = pow(spec.root_of_unity, 1 << (spec.s - k), spec.modulus)
    vals = [RNG.randrange(spec.modulus) for _ in range(n)]
    x = jnp.asarray(dev.to_mont_np(vals))

    local = ntt(dev, x, make_plan(dev, n, omega))
    plan = ShardedNttPlan(dev, n, omega, 4)
    dist = sharded_ntt(dev, mesh, plan, x)
    assert np.array_equal(np.asarray(local), np.asarray(dist))
