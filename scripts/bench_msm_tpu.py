"""Validate + benchmark the Pallas Pippenger MSM on the attached TPU.

Checks kernel results against the host oracle on a small batch, then
times MSMs at several k with pipelined dispatch.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import random
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.curves.host import PALLAS
from halo2_tpu.fields.device import FP_DEV
from halo2_tpu.ops.pallas_point import (points_to_proj, points_from_proj,
                                        padd_flat, pdouble_flat)
from halo2_tpu.ops.msm_pallas import (msm_pallas,
                                      msm_pallas_window_sums_async,
                                      host_horner_combine)

spec = PALLAS
df = FP_DEV
rng = random.Random(7)
print("backend:", jax.default_backend(), flush=True)

# --- kernel correctness on TPU ---
t0 = time.perf_counter()
pts_a = [spec.mul(spec.generator, i + 1) for i in range(7)] + [None]
pts_b = [spec.mul(spec.generator, 3 * i + 2) for i in range(6)] \
    + [None, pts_a[0]]
A = points_to_proj(spec, df, pts_a)
B = points_to_proj(spec, df, pts_b)
out = points_from_proj(spec, df, padd_flat(df, A, B))
exp = [spec.add(x, y) for x, y in zip(pts_a, pts_b)]
assert out == exp, (out, exp)
out2 = points_from_proj(spec, df, pdouble_flat(df, A))
assert out2 == [spec.double(x) for x in pts_a]
print(f"TPU padd/pdouble kernels OK ({time.perf_counter()-t0:.1f}s incl "
      "compile)", flush=True)

# --- MSM correctness (small) ---
t0 = time.perf_counter()
n = 1024
pts = [spec.mul(spec.generator, rng.randrange(1, 100000)) for _ in range(n)]
pts[3] = None
scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
scalars[5] = 0
digits = jnp.asarray(np.stack([
    np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
    for s in scalars]))
P = points_to_proj(spec, df, pts)
got = msm_pallas(spec, df, digits, P)
exp = spec.msm(scalars, pts)
assert got == exp, (got, exp)
print(f"TPU MSM n={n} matches host oracle "
      f"({time.perf_counter()-t0:.1f}s incl compile)", flush=True)

# --- benchmark ---
for k in (11, 13, 16):
    n = 1 << k
    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    bpts = [base_pts[i % 256] for i in range(n)]
    bscalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    bdigits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in bscalars]))
    bproj = jax.device_put(points_to_proj(spec, df, bpts))

    t0 = time.perf_counter()
    wsums, c = msm_pallas_window_sums_async(spec, df, bdigits, bproj)
    r0 = host_horner_combine(spec, points_from_proj(spec, df, wsums), c)
    t_first = time.perf_counter() - t0

    iters = 5
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        w, c = msm_pallas_window_sums_async(spec, df, bdigits, bproj)
        outs.append(w)
    results = [host_horner_combine(spec, points_from_proj(spec, df, w), c)
               for w in outs]
    dt = (time.perf_counter() - t0) / iters
    assert all(r == r0 for r in results)
    print(f"k={k} c={c}: {n/dt:,.0f} points/s  ({dt*1e3:.2f} ms/msm, "
          f"first={t_first:.1f}s)", flush=True)
