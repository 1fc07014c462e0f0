import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['JAX_PLATFORMS'] = 'cpu'
import random
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

from halo2_tpu.curves.host import PALLAS
from halo2_tpu.fields.device import FP_DEV
from halo2_tpu.ops.pallas_point import (points_to_proj, points_from_proj,
    padd_flat, pdouble_flat, padd_masked_flat)
from halo2_tpu.ops.msm_pallas import (msm_pallas, _host_proj_add,
                                      _host_proj_double)

spec = PALLAS
df = FP_DEV
rng = random.Random(1)

p = spec.base.modulus
for _ in range(5):
    a = spec.mul(spec.generator, rng.randrange(1, spec.scalar.modulus))
    b = spec.mul(spec.generator, rng.randrange(1, spec.scalar.modulus))
    for bb in (b, a, None):
        pa = (a[0], a[1], 1)
        pb = (bb[0], bb[1], 1) if bb else (0, 1, 0)
        X, Y, Z = _host_proj_add(p, pa, pb)
        exp = spec.add(a, bb)
        if Z == 0:
            assert exp is None, exp
        else:
            zi = pow(Z, -1, p)
            assert (X * zi % p, Y * zi % p) == exp
    X, Y, Z = _host_proj_double(p, (a[0], a[1], 1))
    zi = pow(Z, -1, p)
    assert (X * zi % p, Y * zi % p) == spec.double(a)
print('host projective formulas OK', flush=True)

pts_a = [spec.mul(spec.generator, i + 1) for i in range(7)] + [None]
pts_b = [spec.mul(spec.generator, 3 * i + 2) for i in range(6)] + [None, pts_a[0]]
A = points_to_proj(spec, df, pts_a)
B = points_to_proj(spec, df, pts_b)
out = points_from_proj(spec, df, padd_flat(df, A, B))
exp = [spec.add(x, y) for x, y in zip(pts_a, pts_b)]
assert out == exp, (out, exp)
print('padd OK', flush=True)
out2 = points_from_proj(spec, df, pdouble_flat(df, A))
assert out2 == [spec.double(x) for x in pts_a]
out3 = points_from_proj(spec, df, padd_flat(df, A, A))
assert out3 == [spec.double(x) for x in pts_a]
mask = jnp.asarray(np.array([1, 0, 1, 0, 1, 0, 1, 0], np.uint32))
out4 = points_from_proj(spec, df, padd_masked_flat(df, A, B, mask))
exp4 = [spec.add(x, y) if m else x
        for x, y, m in zip(pts_a, pts_b, [1, 0] * 4)]
assert out4 == exp4
print('pallas point kernels OK (interpret)', flush=True)

for n in (8, 100):
    pts = [spec.mul(spec.generator, rng.randrange(1, 1000)) for _ in range(n)]
    pts[3] = None
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    scalars[5] = 0
    digits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))
    P = points_to_proj(spec, df, pts)
    got = msm_pallas(spec, df, digits, P)
    exp = spec.msm(scalars, pts)
    assert got == exp, (n, got, exp)
    print(f'msm n={n} OK', flush=True)
print('ALL OK', flush=True)
