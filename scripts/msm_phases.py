"""Phase decomposition of the production signed+mixed window-sums at a
given c, all phases timed in ONE process (the chip's run-to-run variance
is ~30%, so only same-process comparisons are meaningful).

Run: python scripts/msm_phases.py [k] [c]
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
from halo2_tpu.ops import msm_pallas as mp
from halo2_tpu.ops.pallas_point import (
    points_to_proj, pmixed_masked_flat, padd_masked_flat, _ident_col_j)


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
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 11
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
    aff = proj[:32]

    BL = 1 << (c - 1)
    W = -(-256 // c)
    G = W
    print(f"k={k} c={c} BL={BL} W={W} lanes={G*BL}", flush=True)

    # phase 1: digits + signed recode
    @jax.jit
    def ph_digits(d16):
        return mp.window_digits_signed(d16, c)
    t = timeit(lambda: ph_digits(digits))
    print(f"digits+recode:   {t*1e3:8.2f} ms", flush=True)

    # phase 2: argsort
    d, sg = jax.block_until_ready(ph_digits(digits))

    @jax.jit
    def ph_sort(d):
        return jnp.argsort(d, axis=1).astype(jnp.int32)
    t = timeit(lambda: ph_sort(d))
    print(f"argsort [W,n]:   {t*1e3:8.2f} ms", flush=True)

    order = jax.block_until_ready(ph_sort(d))

    # phase 3: take_along + bisect
    @jax.jit
    def ph_bisect(d, order):
        ds = jnp.take_along_axis(d, order, axis=1)
        buckets = (jnp.arange(BL, dtype=jnp.uint32) + 1)[None, :]

        def _bisect(leq):
            lo = jnp.zeros((G, BL), dtype=jnp.int32)
            hi = jnp.full((G, BL), n, dtype=jnp.int32)
            for _ in range(n.bit_length()):
                mid = (lo + hi) >> 1
                v = jnp.take_along_axis(ds, jnp.minimum(mid, n - 1),
                                        axis=1)
                go_right = (v <= buckets) if leq else (v < buckets)
                go_right = go_right & (mid < hi)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(go_right, hi, mid)
            return lo
        return _bisect(False), _bisect(True)
    t = timeit(lambda: ph_bisect(d, order))
    print(f"sortgather+bisect:{t*1e3:7.2f} ms", flush=True)

    starts, ends = jax.block_until_ready(ph_bisect(d, order))
    counts = ends - starts
    rounds = int(np.asarray(counts).max())
    # emulate slotting round count (top window handled): cap by mean+slack
    mean = n // BL
    rounds_slotted = mean + 3 * int(mean ** 0.5) + 8
    print(f"maxrun(raw)={rounds} slotted~{rounds_slotted}", flush=True)

    lanes = G * BL
    ident = _ident_col_j(df.spec.modulus)
    acc0 = jnp.broadcast_to(ident[:, None], (3 * NLIMBS, lanes))
    mask = jnp.ones((lanes,), jnp.uint32)
    R = rounds_slotted

    # phase 4a: loop with REAL per-round gathers (take_along idx chains)
    so = jnp.minimum(starts, n - 1).astype(jnp.int32)

    @jax.jit
    def ph_loop_real(acc, order, sg, A):
        def body(r, acc):
            idx = jnp.minimum(so + r, n - 1)
            gidx = jnp.take_along_axis(order, idx, axis=1)
            sig = jnp.take_along_axis(sg, gidx, axis=1).reshape(-1)
            P = jnp.take(A, gidx.reshape(-1), axis=1)
            return pmixed_masked_flat(df, acc, P, mask, signs=sig,
                                      interpret=False)
        return jax.lax.fori_loop(0, R, body, acc)
    t = timeit(lambda: ph_loop_real(acc0, order, sg, aff))
    print(f"loop real x{R}:  {t*1e3:8.2f} ms ({t/R*1e6:.0f} us/round)",
          flush=True)

    # phase 4b: loop without the sign gather
    @jax.jit
    def ph_loop_nosign(acc, order, A):
        def body(r, acc):
            idx = jnp.minimum(so + r, n - 1)
            gidx = jnp.take_along_axis(order, idx, axis=1)
            P = jnp.take(A, gidx.reshape(-1), axis=1)
            return pmixed_masked_flat(df, acc, P, mask, interpret=False)
        return jax.lax.fori_loop(0, R, body, acc)
    t = timeit(lambda: ph_loop_nosign(acc0, order, aff))
    print(f"loop nosign x{R}:{t*1e3:8.2f} ms", flush=True)

    # phase 4c: loop with precomputed flat indices (pure gather+kernel)
    gidx0 = jnp.asarray(np.random.default_rng(0).integers(
        0, n, size=(R, lanes), dtype=np.int32))

    @jax.jit
    def ph_loop_flat(acc, A):
        def body(r, acc):
            P = jnp.take(A, gidx0[r], axis=1)
            return pmixed_masked_flat(df, acc, P, mask, interpret=False)
        return jax.lax.fori_loop(0, R, body, acc)
    t = timeit(lambda: ph_loop_flat(acc0, aff))
    print(f"loop flat x{R}:  {t*1e3:8.2f} ms", flush=True)

    # phase 4d: kernel-only loop
    P0 = jnp.asarray(np.tile(np.asarray(aff)[:, :BL], (1, W)))

    @jax.jit
    def ph_loop_kernel(acc, P):
        def body(r, acc):
            return pmixed_masked_flat(df, acc, P, mask, interpret=False)
        return jax.lax.fori_loop(0, R, body, acc)
    t = timeit(lambda: ph_loop_kernel(acc0, P0))
    print(f"loop kernel x{R}:{t*1e3:8.2f} ms", flush=True)

    # phase 5: reductions (2 log2 BL masked adds)
    logb = int(np.ceil(np.log2(BL)))

    @jax.jit
    def ph_reduce(acc):
        bidx = jnp.arange(BL, dtype=jnp.int32)

        def suffix_round(i, suf):
            s = jnp.int32(1) << i
            suf3 = suf.reshape(3 * NLIMBS, G, BL)
            shifted = jnp.roll(suf3, -s, axis=2).reshape(3 * NLIMBS, -1)
            m2 = jnp.broadcast_to((bidx + s < BL)[None, :], (G, BL))
            return padd_masked_flat(df, suf, shifted,
                                    m2.reshape(-1).astype(jnp.uint32),
                                    interpret=False)
        return jax.lax.fori_loop(0, 2 * logb, suffix_round, acc)
    t = timeit(lambda: ph_reduce(acc0))
    print(f"reduce x{2*logb}:    {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
