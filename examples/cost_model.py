"""Cost-model CLI: describe a circuit abstractly, get proof size and a
verification-time estimate (reference: halo2_proofs/examples/
cost-model.rs:48-303 — describes circuits by columns/rotations/lookups/
permutations/gate degree and measures live multiexp timing).

Usage:
  python examples/cost_model.py --k 11 --advice 5 --fixed 2 --instance 1 \
      --lookups 1 --permutation-columns 4 --gate-degree 4
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=11)
    ap.add_argument("--advice", type=int, default=3)
    ap.add_argument("--fixed", type=int, default=1)
    ap.add_argument("--instance", type=int, default=1)
    ap.add_argument("--lookups", type=int, default=0)
    ap.add_argument("--permutation-columns", type=int, default=0)
    ap.add_argument("--gate-degree", type=int, default=3)
    ap.add_argument("--measure-msm", action="store_true",
                    help="time a live device MSM to estimate verify time")
    args = ap.parse_args()

    # proof-size accounting (dev/cost.rs:347-416 formulas)
    k = args.k
    chunk = max(args.gate_degree - 2, 1)
    perm_chunks = ((args.permutation_columns + chunk - 1) // chunk
                   if args.permutation_columns else 0)
    quotient = max(args.gate_degree - 1, 1)

    points = (args.advice + 3 * args.lookups + perm_chunks  # per-proof
              + 1 + quotient                                # vanishing
              + 1                                           # multiopen q'
              + 1 + 2 * k)                                  # IPA
    # rough eval counts: one eval per query + argument evals
    evals = (args.advice + args.instance + args.fixed
             + 5 * args.lookups
             + (3 * perm_chunks - 1 if perm_chunks else 0)
             + args.permutation_columns
             + 1                                            # random_eval
             + 4                                            # point-set u_i
             + 2)                                           # IPA c, f
    size = (points + evals) * 32
    print(f"estimated proof size: {size} bytes "
          f"({points} points, {evals} scalars)")

    if args.measure_msm:
        import jax
        import jax.numpy as jnp
        import numpy as np
        import random
        from halo2_tpu.curves import PALLAS, PALLAS_DEV
        from halo2_tpu.ops.msm import msm
        rng = random.Random(0)
        n = 1 << min(k, 11)
        pts = [PALLAS.mul(PALLAS.generator, i + 1) for i in range(256)]
        pts = [pts[i % 256] for i in range(n)]
        scalars = [rng.randrange(PALLAS.scalar.modulus) for _ in range(n)]
        digits = jnp.asarray(np.stack([
            np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)],
                     np.uint32) for s in scalars]))
        jp = PALLAS_DEV.points_to_device(pts)
        fn = jax.jit(lambda d, x, y, z: msm(
            PALLAS_DEV, d, type(jp)(x, y, z)))
        out = fn(digits, jp.x, jp.y, jp.z)
        jax.block_until_ready(out.x)
        t0 = time.perf_counter()
        out = fn(digits, jp.x, jp.y, jp.z)
        jax.block_until_ready(out.x)
        dt = time.perf_counter() - t0
        print(f"measured {n}-point MSM: {dt*1e3:.1f} ms "
              f"(verification ~1 such MSM)")


if __name__ == "__main__":
    main()
