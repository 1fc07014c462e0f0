"""Decompose the k=16 MSM wall-clock into phases on the real chip.

Times, each as its own jitted program (5 iters, forced readback sync):
  1. digits+sort+bisect   (the XLA preprocessing before the round loop)
  2. full window_sums     (the production program)
  3. padd-only loop       (round-loop adds on resident data: kernel ceiling)
  4. gather+padd loop     (adds + the per-round [48, lanes] gather)

Run: python scripts/msm_profile.py [k]
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
from halo2_tpu.fields.device import FP_DEV, NLIMBS
from halo2_tpu.ops.msm_pallas import (
    msm_pallas_window_sums_async, window_digits, pick_c)
from halo2_tpu.ops.pallas_point import padd_masked_flat, _ident_col_j


def timeit(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # force sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << k
    import random
    rng = random.Random(7)
    spec = PALLAS
    df = FP_DEV
    c = pick_c(n)
    B = 1 << c
    W = -(-256 // c)
    print(f"k={k} n={n} c={c} B={B} W={W}", flush=True)

    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    from halo2_tpu.ops.pallas_point import points_to_proj
    pts = [base_pts[i % 256] for i in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))
    proj = jax.device_put(points_to_proj(spec, df, pts))

    # ---- 1. preprocessing only ----
    @jax.jit
    def prep(d16):
        d = window_digits(d16, c)
        order = jnp.argsort(d, axis=1).astype(jnp.int32)
        ds = jnp.take_along_axis(d, order, axis=1)
        buckets = jnp.arange(B, dtype=jnp.uint32)[None, :]

        def _bisect(leq):
            lo = jnp.zeros((W, B), dtype=jnp.int32)
            hi = jnp.full((W, B), n, dtype=jnp.int32)
            for _ in range(n.bit_length()):
                mid = (lo + hi) >> 1
                v = jnp.take_along_axis(ds, jnp.minimum(mid, n - 1), axis=1)
                go_right = (v <= buckets) if leq else (v < buckets)
                go_right = go_right & (mid < hi)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            return lo
        return _bisect(False), _bisect(True), order

    t = timeit(lambda: prep(digits))
    print(f"prep (digits+sort+bisect): {t*1e3:9.2f} ms", flush=True)

    # ---- 2. full window_sums ----
    def full():
        w, _ = msm_pallas_window_sums_async(spec, df, digits, proj, c,
                                            aff=proj[:32])
        return w
    t_full = timeit(full)
    print(f"full window_sums:          {t_full*1e3:9.2f} ms "
          f"({n/t_full:,.0f} pts/s)", flush=True)

    # ---- 3. padd-only round loop (no gather) ----
    rounds = n // B + 3 * int((n / B) ** 0.5) + 4
    lanes = W * B
    ident = _ident_col_j(df.spec.modulus)
    acc0 = jnp.broadcast_to(ident[:, None], (3 * NLIMBS, lanes))
    P0 = jnp.asarray(np.tile(np.asarray(proj)[:, :B], (1, W)))
    mask = jnp.ones((lanes,), jnp.uint32)

    @jax.jit
    def addloop(acc, P):
        def body(r, acc):
            return padd_masked_flat(df, acc, P, mask, interpret=False)
        return jax.lax.fori_loop(0, rounds, body, acc)

    t = timeit(lambda: addloop(acc0, P0))
    print(f"padd-only x{rounds}:       {t*1e3:9.2f} ms "
          f"({rounds*lanes/t/1e6:,.1f}M adds/s)", flush=True)

    # ---- 4. gather + padd round loop ----
    gidx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, n, size=(rounds, lanes),
                                          dtype=np.int32))

    @jax.jit
    def gaddloop(acc, P):
        def body(r, acc):
            Pg = jnp.take(P, gidx0[r], axis=1)
            return padd_masked_flat(df, acc, Pg, mask, interpret=False)
        return jax.lax.fori_loop(0, rounds, body, acc)

    t = timeit(lambda: gaddloop(acc0, proj))
    print(f"gather+padd x{rounds}:     {t*1e3:9.2f} ms "
          f"({rounds*lanes/t/1e6:,.1f}M adds/s)", flush=True)

    # ---- 5. gather-only loop (cheap combine, no point math) ----
    @jax.jit
    def gonly(P):
        def body(r, acc):
            Pg = jnp.take(P, gidx0[r], axis=1)
            return acc + Pg
        return jax.lax.fori_loop(
            0, rounds, body, jnp.zeros((3 * NLIMBS, lanes), jnp.uint32))

    t = timeit(lambda: gonly(proj))
    print(f"gather-only x{rounds}:     {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
