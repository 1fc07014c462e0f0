"""Verification probes for the Pallas MSM on the attached TPU:
degenerate digit distributions (the round-loop's worst cases) and the
ops/msm.py dispatch boundary."""
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
from halo2_tpu.ops.pallas_point import points_to_proj
from halo2_tpu.ops.msm_pallas import msm_pallas

spec, df = PALLAS, FP_DEV
rng = random.Random(99)
print("backend:", jax.default_backend(), flush=True)

n = 4096
pts = [spec.mul(spec.generator, rng.randrange(1, 1 << 200))
       for _ in range(n)]
P = points_to_proj(spec, df, pts)


def dig(scalars):
    return jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))


cases = {
    "all-zero scalars": [0] * n,
    "all-equal scalars": [123456789] * n,
    "all-ones": [1] * n,
    "max scalar": [spec.scalar.modulus - 1] * n,
    "single nonzero": [0] * (n - 1) + [rng.randrange(spec.scalar.modulus)],
    "random": [rng.randrange(spec.scalar.modulus) for _ in range(n)],
}
for name, scalars in cases.items():
    t0 = time.perf_counter()
    got = msm_pallas(spec, df, dig(scalars), P)
    dt = time.perf_counter() - t0
    exp = spec.msm(scalars, pts)
    status = "OK" if got == exp else f"MISMATCH got={got} exp={exp}"
    print(f"{name:>20}: {status}  ({dt:.2f}s)", flush=True)
    assert got == exp
print("all probes passed", flush=True)
