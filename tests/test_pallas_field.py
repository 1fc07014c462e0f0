"""Pallas Montgomery-multiply kernel vs exact host arithmetic
(interpret mode on CPU; compiled on TPU in bench runs)."""
import random

import numpy as np
import jax.numpy as jnp

from halo2_tpu.fields import FP, FP_DEV
from halo2_tpu.ops.pallas_field import (fmul_pallas, to_limbs_first,
                                        from_limbs_first)

RNG = random.Random(3)


def test_pallas_fmul_matches_host():
    n = 512
    a = [RNG.randrange(FP.modulus) for _ in range(n)]
    b = [RNG.randrange(FP.modulus) for _ in range(n)]
    a[0], b[0] = FP.modulus - 1, FP.modulus - 1
    a[1], b[1] = 0, 12345
    da = to_limbs_first(jnp.asarray(FP_DEV.to_mont_np(a)))
    db = to_limbs_first(jnp.asarray(FP_DEV.to_mont_np(b)))
    out = from_limbs_first(fmul_pallas(FP_DEV, da, db, interpret=True))
    got = FP_DEV.from_mont_np(np.asarray(out))
    for g, x, y in zip(got, a, b):
        assert int(g) == x * y % FP.modulus


def test_ntt_pallas_matches_jnp():
    from halo2_tpu.ops import make_plan, ntt
    from halo2_tpu.ops.pallas_field import ntt_pallas
    k = 10
    n = 1 << k
    omega = pow(FP.root_of_unity, 1 << (FP.s - k), FP.modulus)
    vals = [RNG.randrange(FP.modulus) for _ in range(n)]
    import jax.numpy as jnp
    a = jnp.asarray(FP_DEV.to_mont_np(vals))
    plan = make_plan(FP_DEV, n, omega)
    want = np.asarray(ntt(FP_DEV, a, plan))
    got = np.asarray(from_limbs_first(
        ntt_pallas(FP_DEV, to_limbs_first(a), plan, interpret=True)))
    assert np.array_equal(want, got)
