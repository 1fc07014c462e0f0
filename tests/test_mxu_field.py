"""MXU constant-multiply path (ops/mxu_field.py): exactness against the
VPU fmul oracle and bit parity of the four-step MXU NTT (single and
batched) with the radix-2 reference kernel."""
import random

import numpy as np
import jax.numpy as jnp

from halo2_tpu.fields import FQ, FP
from halo2_tpu.fields.device import FQ_DEV, FP_DEV, fmul
from halo2_tpu.ops.mxu_field import (mul_const_grouped, band_matrices,
                                     ntt_mxu, ntt_mxu_b)
from halo2_tpu.ops.ntt import make_plan, ntt


def test_mul_const_grouped_matches_fmul():
    rng = random.Random(1)
    for df, fs in ((FQ_DEV, FQ), (FP_DEV, FP)):
        p = fs.modulus
        G, nb = 5, 7
        consts = [rng.randrange(p) for _ in range(G)] + [0, 1, p - 1]
        consts = consts[:G]
        vals = [[rng.randrange(p) for _ in range(nb)] for _ in range(G)]
        x = jnp.asarray(np.stack(
            [np.asarray(df.to_mont_np(v)).reshape(nb, 16) for v in vals]))
        W = jnp.asarray(band_matrices(df, consts))
        got = np.asarray(mul_const_grouped(df, x, W))
        for g in range(G):
            cm = df.scalar(consts[g])
            exp = np.asarray(fmul(df, x[g],
                                  jnp.broadcast_to(cm, (nb, 16))))
            assert np.array_equal(got[g], exp), (fs.modulus, g)


def test_mul_const_grouped_edge_values():
    """p-1 digits are all-large: the exactness bound's worst case."""
    df, fs = FQ_DEV, FQ
    p = fs.modulus
    consts = [p - 1, p - 2]
    vals = [[p - 1, 1, 0], [p - 1, p - 2, 12345]]
    x = jnp.asarray(np.stack(
        [np.asarray(df.to_mont_np(v)).reshape(3, 16) for v in vals]))
    W = jnp.asarray(band_matrices(df, consts))
    got = np.asarray(mul_const_grouped(df, x, W))
    for g in range(2):
        cm = df.scalar(consts[g])
        exp = np.asarray(fmul(df, x[g], jnp.broadcast_to(cm, (3, 16))))
        assert np.array_equal(got[g], exp)


def test_ntt_mxu_matches_radix2():
    rng = random.Random(2)
    df, fs = FQ_DEV, FQ
    for k in (4, 7, 10):
        n = 1 << k
        omega = pow(fs.root_of_unity, 1 << (fs.s - k), fs.modulus)
        plan = make_plan(df, n, omega)
        a = df.upload_values([rng.randrange(fs.modulus)
                              for _ in range(n)])
        assert np.array_equal(np.asarray(ntt(df, a, plan)),
                              np.asarray(ntt_mxu(df, a, plan))), k


def test_ntt_mxu_batched_and_inverse():
    rng = random.Random(3)
    df, fs = FQ_DEV, FQ
    k, m = 8, 3
    n = 1 << k
    p = fs.modulus
    omega = pow(fs.root_of_unity, 1 << (fs.s - k), p)
    plan = make_plan(df, n, omega)
    plan_inv = make_plan(df, n, pow(omega, p - 2, p))
    x = jnp.stack([df.upload_values([rng.randrange(p) for _ in range(n)])
                   for _ in range(m)])
    got = np.asarray(ntt_mxu_b(df, x, plan))
    for j in range(m):
        assert np.array_equal(got[j], np.asarray(ntt(df, x[j], plan)))
    # inverse root through the same code path (plans are root-agnostic)
    got_i = np.asarray(ntt_mxu_b(df, x, plan_inv))
    for j in range(m):
        assert np.array_equal(got_i[j],
                              np.asarray(ntt(df, x[j], plan_inv)))
