"""Isolate the round-5 MSM regression: time _normalize_affine, the
pmixed vs padd round loops, and the signed-path extras on the chip.

Run: python scripts/msm_probe_r5.py [k]
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
from halo2_tpu.ops.msm_pallas import _normalize_affine, pick_c
from halo2_tpu.ops.pallas_point import (
    padd_masked_flat, pmixed_masked_flat, _ident_col_j, points_to_proj)


def timeit(fn, iters=5):
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << k
    spec = PALLAS
    df = FP_DEV
    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    pts = [base_pts[i % 256] for i in range(n)]
    proj = jax.device_put(points_to_proj(spec, df, pts))

    # 1. normalize_affine, eager (as called today)
    t = timeit(lambda: _normalize_affine(df, proj))
    print(f"normalize_affine eager:    {t*1e3:9.2f} ms", flush=True)

    # 2. normalize_affine, jitted
    njit = jax.jit(lambda p: _normalize_affine(df, p))
    t = timeit(lambda: njit(proj))
    print(f"normalize_affine jit:      {t*1e3:9.2f} ms", flush=True)

    aff, projn = jax.block_until_ready(njit(proj))

    c = pick_c(n)
    BL = 1 << (c - 1)
    W = -(-256 // c)
    lanes = W * BL
    rounds = 2 * (n // (1 << c)) + 3 * int((2 * n / (1 << c)) ** 0.5) + 4
    print(f"c={c} BL={BL} W={W} lanes={lanes} rounds={rounds}", flush=True)

    ident = _ident_col_j(df.spec.modulus)
    acc0 = jnp.broadcast_to(ident[:, None], (3 * NLIMBS, lanes))
    mask = jnp.ones((lanes,), jnp.uint32)
    gidx0 = jnp.asarray(
        np.random.default_rng(0).integers(0, n, size=(rounds, lanes),
                                          dtype=np.int32))
    sg = jnp.asarray(
        np.random.default_rng(1).integers(0, 2, size=(rounds, lanes))
        .astype(np.uint32))

    # 3. gather + projective padd loop (r4 shape, at signed lane count)
    @jax.jit
    def g_padd(acc, P):
        def body(r, acc):
            Pg = jnp.take(P, gidx0[r], axis=1)
            return padd_masked_flat(df, acc, Pg, mask, interpret=False)
        return jax.lax.fori_loop(0, rounds, body, acc)
    t = timeit(lambda: g_padd(acc0, projn))
    print(f"gather48+padd x{rounds}:   {t*1e3:9.2f} ms", flush=True)

    # 4. gather + mixed add, no signs
    @jax.jit
    def g_mixed(acc, A):
        def body(r, acc):
            Pg = jnp.take(A, gidx0[r], axis=1)
            return pmixed_masked_flat(df, acc, Pg, mask, interpret=False)
        return jax.lax.fori_loop(0, rounds, body, acc)
    t = timeit(lambda: g_mixed(acc0, aff))
    print(f"gather32+pmixed x{rounds}: {t*1e3:9.2f} ms", flush=True)

    # 5. gather + mixed add with signs
    @jax.jit
    def g_mixed_s(acc, A):
        def body(r, acc):
            Pg = jnp.take(A, gidx0[r], axis=1)
            return pmixed_masked_flat(df, acc, Pg, mask, signs=sg[r],
                                      interpret=False)
        return jax.lax.fori_loop(0, rounds, body, acc)
    t = timeit(lambda: g_mixed_s(acc0, aff))
    print(f"gather32+pmixed+sg x{rounds}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
