"""Mirror of the reference's small-multiexp benchmark.

Reference: halo2_proofs/benches/arithmetic.rs:16-33 — `small_multiexp`
(double-and-add with shared doublings, arithmetic.rs:116-136) over 16
two-term (coeff_1, coeff_2)x(g_lo, g_hi) pairs from a k=5 EqAffine SRS.
Here both paths are timed: the exact host double-and-add and the device
`msm_small` batch (all 16 pairs in one dispatch).
Run: python scripts/bench_arithmetic.py
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                 (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from halo2_tpu.curves import VESTA  # noqa: E402  (EqAffine = Vesta)
from halo2_tpu.poly.commitment import Params  # noqa: E402


def main():
    spec = VESTA
    params = Params.new(spec, 5)
    g = params.g
    half = len(g) // 2
    g_lo, g_hi = g[:half], g[half:]
    rng = random.Random(7)
    q = spec.scalar.modulus
    c1, c2 = rng.randrange(q), rng.randrange(q)

    # host double-and-add (small_multiexp analogue): 16 two-term multiexps
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        for lo, hi in zip(g_lo, g_hi):
            spec.add(spec.mul(lo, c1), spec.mul(hi, c2))
    t_host = (time.perf_counter() - t0) / reps
    print(f"host double-and-add   16x 2-term: {t_host * 1e3:9.3f} ms")

    # device batch: all 16 two-term multiexps as one vmapped ladder
    from halo2_tpu.curves.device import PALLAS_DEV, VESTA_DEV, normalize
    from halo2_tpu.ops.msm import msm_small
    dev = VESTA_DEV if spec.name == "vesta" else PALLAS_DEV

    def digits(s):
        return np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)],
                        np.uint32)

    dig = jnp.asarray(np.stack([digits(c1), digits(c2)]))

    @jax.jit
    def batch(dig, pts):
        return msm_small(dev, dig, pts)

    pairs = [dev.points_to_device([lo, hi]) for lo, hi in zip(g_lo, g_hi)]
    outs = [batch(dig, p) for p in pairs]  # warm-up/compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = [batch(dig, p) for p in pairs]
    res = [dev.points_from_device(normalize(dev, o))[0] for o in outs]
    t_dev = (time.perf_counter() - t0) / reps
    print(f"device msm_small      16x 2-term: {t_dev * 1e3:9.3f} ms")

    expect = [spec.add(spec.mul(lo, c1), spec.mul(hi, c2))
              for lo, hi in zip(g_lo, g_hi)]
    assert res == expect, "device result mismatch vs host oracle"


if __name__ == "__main__":
    main()
