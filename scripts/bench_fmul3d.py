"""Compare fmul kernel layouts: [16, N] rows (1-D per-limb vectors) vs
[16, M, 128] (native (8,128) VPU tiles per limb)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.fields.device import FP_DEV, NLIMBS, MASK, LIMB_BITS

df = FP_DEV
p = df.p_limbs
n0 = df.n0
nz = [j for j in range(1, NLIMBS) if p[j] != 0]


def kernel3d(a_ref, b_ref, out_ref):
    a = [a_ref[i] for i in range(NLIMBS)]   # each (S, 128)
    b = [b_ref[i] for i in range(NLIMBS)]
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            prod = a[i] * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    c = zero
    for i in range(NLIMBS):
        t = cols[i] + c
        m = (t * n0) & MASK
        mp0 = m * p[0]
        u = t + (mp0 & MASK)
        c = (u >> LIMB_BITS) + (mp0 >> LIMB_BITS)
        for j in nz:
            prod = m * p[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    out = []
    for i in range(NLIMBS):
        t = cols[NLIMBS + i] + c
        out.append(t & MASK)
        c = t >> LIMB_BITS
    d = []
    borrow = jnp.zeros_like(out[0])
    for i in range(NLIMBS):
        t = out[i] + jnp.uint32(1 << LIMB_BITS) - p[i] - borrow
        d.append(t & MASK)
        borrow = jnp.uint32(1) - (t >> LIMB_BITS)
    use_d = (c | (jnp.uint32(1) - borrow)).astype(jnp.bool_)
    for i in range(NLIMBS):
        out_ref[i] = jnp.where(use_d, d[i], out[i])


def build3d(m, sub):
    # array shape [16, m, 128]; block (16, sub, 128)
    grid = (m // sub,)
    spec = pl.BlockSpec((NLIMBS, sub, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel3d,
        out_shape=jax.ShapeDtypeStruct((NLIMBS, m, 128), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
    )
    return jax.jit(fn)


rng = np.random.default_rng(0)

def rand_mont3d(m):
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(m * 128)]
    a = df.to_mont_np(vals)  # [m*128, 16]
    return jnp.asarray(a.T.reshape(NLIMBS, m, 128))

R = int(os.environ.get("REPEATS", "64"))

print("backend:", jax.default_backend(), flush=True)
for logn in (12, 14, 16, 18, 20):
    n = 1 << logn
    m = n // 128
    for sub in (8, 16, 32):
        if m % sub:
            continue
        a = rand_mont3d(m)
        b = rand_mont3d(m)
        f = build3d(m, sub)

        @jax.jit
        def chain(a, b, f=f):
            return jax.lax.fori_loop(0, R, lambda i, x: f(x, b), a)

        out = chain(a, b)
        np.asarray(out[0, 0])
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = chain(a, b)
            np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / iters
        total = n * R
        print(f"3d n=2^{logn} sub={sub:3d}  {total/dt/1e6:9.1f} M modmul/s"
              f"   ({dt*1e3:.2f} ms)", flush=True)
