"""Sweep the Pippenger window size c on the real chip for the
production (signed + mixed-add) window-sums program.

Run: python scripts/msm_sweep_c.py [k] [cmin] [cmax]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
import jax.numpy as jnp

from halo2_tpu.curves import PALLAS
from halo2_tpu.fields.device import FP_DEV
from halo2_tpu.ops.msm_pallas import msm_pallas_window_sums_async, pick_c
from halo2_tpu.ops.pallas_point import points_to_proj


def timeit(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cmin = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cmax = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    n = 1 << k
    import random
    rng = random.Random(7)
    spec = PALLAS
    df = FP_DEV
    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    pts = [base_pts[i % 256] for i in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))
    proj = jax.device_put(points_to_proj(spec, df, pts))
    print(f"k={k} model pick_c={pick_c(n)}", flush=True)
    for c in range(cmin, cmax + 1):
        try:
            t = timeit(lambda: msm_pallas_window_sums_async(
                spec, df, digits, proj, c, aff=proj[:32])[0])
            print(f"c={c}: {t*1e3:8.2f} ms  ({n/t:,.0f} pts/s)",
                  flush=True)
        except Exception as e:
            print(f"c={c}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
