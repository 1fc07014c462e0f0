"""Microbenchmark: per-chip 255-bit Montgomery-multiply throughput via
the Pallas kernel — the speed-of-light denominator for MSM/NTT targets
(BASELINE.md). Prints one JSON line (not the driver metric; see bench.py).

Usage: python bench_modmul.py [N_LOG2=20]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import random
    import numpy as np
    import jax
    import jax.numpy as jnp

    from halo2_tpu.fields import FP, FP_DEV
    from halo2_tpu.ops.pallas_field import fmul_pallas, to_limbs_first

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    rng = random.Random(1)
    # random digits directly (any residues are valid mont inputs)
    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 16, size=(16, n), dtype=np.uint32))
    b = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 16, size=(16, n), dtype=np.uint32))
    # clamp top limb below p's top limb so inputs < p
    a = a.at[15].set(a[15] & 0x3FFF)
    b = b.at[15].set(b[15] & 0x3FFF)

    out = fmul_pallas(FP_DEV, a, b)
    _ = np.asarray(out[0, :8])  # sync

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fmul_pallas(FP_DEV, a, b)
        _ = np.asarray(out[0, :8])  # tiny sync read (tunnel-safe)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"pallas_modmul_n2^{k}_muls_per_s",
        "value": round(n / dt, 1),
        "unit": "modmul/s",
        "platform": jax.devices()[0].platform,
    }), flush=True)


def bench_ntt(k: int):
    """NTT butterflies/s via the Pallas path (BASELINE NTT metric)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from halo2_tpu.fields import FP, FP_DEV
    from halo2_tpu.ops import make_plan
    from halo2_tpu.ops.pallas_field import ntt_pallas

    n = 1 << k
    omega = pow(FP.root_of_unity, 1 << (FP.s - k), FP.modulus)
    plan = make_plan(FP_DEV, n, omega)
    a = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 16, size=(16, n), dtype=np.uint32))
    a = a.at[15].set(a[15] & 0x3FFF)
    fn = jax.jit(lambda x: ntt_pallas(FP_DEV, x, plan))
    out = fn(a)
    _ = np.asarray(out[0, :8])
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a)
        _ = np.asarray(out[0, :8])
    dt = (time.perf_counter() - t0) / iters
    butterflies = (n // 2) * k
    print(json.dumps({
        "metric": f"pallas_ntt_k{k}_butterflies_per_s",
        "value": round(butterflies / dt, 1),
        "unit": "butterflies/s",
        "platform": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ntt":
        bench_ntt(int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    else:
        main()
