"""Microbenchmark: Pallas Montgomery-multiply throughput on the attached chip.

Measures modmul/s with the dispatch amortized by chaining R multiplies
inside one jitted call (x = fmul(x, b) R times), so the number reflects
kernel throughput, not tunnel latency.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.fields.device import FP_DEV, NLIMBS
from halo2_tpu.ops.pallas_field import fmul_pallas

print("backend:", jax.default_backend(), jax.devices(), flush=True)

df = FP_DEV
rng = np.random.default_rng(0)
P = df.spec.modulus

def rand_mont(n):
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    return jnp.asarray(df.to_mont_np(vals)).T.copy()  # [16, n]

R = int(os.environ.get("REPEATS", "64"))

for logn in (12, 14, 16, 18):
    n = 1 << logn
    a = rand_mont(n)
    b = rand_mont(n)

    @jax.jit
    def chain(a, b):
        def body(i, x):
            return fmul_pallas(df, x, b)
        return jax.lax.fori_loop(0, R, body, a)

    out = chain(a, b)
    np.asarray(out[0])  # sync
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = chain(a, b)
        np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters
    total = n * R
    print(f"n=2^{logn}  {total/dt/1e6:9.1f} M modmul/s   ({dt*1e3:.2f} ms "
          f"for {R} chained muls)", flush=True)
