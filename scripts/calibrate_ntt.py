"""Measure the native-host vs device NTT crossover and cache it per box.

poly/domain.py routes base-domain transforms at or below
`native_ntt_max()` to the native C++ host library; this script measures
both paths at k = 12..19 on the CURRENT backend and writes the largest
size where the host still wins to .jax_cache/ntt_crossover.json, keyed
by backend name. domain.py picks the cached value up automatically
(HALO2_TPU_NATIVE_NTT_MAX still overrides). Run once per box / after
runtime changes:  python scripts/calibrate_ntt.py
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache",
                                   os.environ.get("JAX_PLATFORMS", "axon")
                                   .split(",")[0] or "axon"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp
    from halo2_tpu.fields import FQ
    from halo2_tpu.fields.device import FQ_DEV
    from halo2_tpu.ops.ntt import make_plan
    from halo2_tpu.poly.domain import _ntt_dispatch
    from halo2_tpu.curves import native

    backend = jax.default_backend()
    idx = native.field_idx(FQ)
    if idx is None:
        print(json.dumps({"error": "native library unavailable"}))
        return
    df = FQ_DEV
    p = FQ.modulus
    crossover = 0
    rows = []
    for k in range(12, 20):
        n = 1 << k
        omega = pow(FQ.root_of_unity, 1 << (FQ.s - k), p)

        # native timing
        rng = np.random.default_rng(3)
        a = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
        om_mont = omega * (1 << 256) % p
        native.ntt_inplace(idx, a, om_mont)  # warm
        t0 = time.perf_counter()
        iters = max(1, (1 << 22) // n)
        for _ in range(iters):
            native.ntt_inplace(idx, a, om_mont)
        t_native = (time.perf_counter() - t0) / iters

        # device timing (the production dispatch path)
        plan = make_plan(df, n, omega)
        vals = rng.integers(0, 1 << 16, size=(n, 16)).astype(np.uint32)
        x = jnp.asarray(vals)
        fn = jax.jit(lambda v, plan=plan: _ntt_dispatch(df, v, plan))
        y = fn(x)
        np.asarray(y[:1])
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(x)
        np.asarray(y[:1])
        t_dev = (time.perf_counter() - t0) / iters

        rows.append({"k": k, "native_s": round(t_native, 5),
                     "device_s": round(t_dev, 5)})
        if t_native < t_dev:
            crossover = n
        print(f"k={k}: native {t_native*1e3:8.2f} ms  "
              f"device {t_dev*1e3:8.2f} ms", flush=True)

    path = os.path.join(REPO, ".jax_cache", "ntt_crossover.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = {}
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        pass
    data[backend] = crossover
    data[f"{backend}_detail"] = rows
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({"backend": backend, "native_ntt_max": crossover}))


if __name__ == "__main__":
    main()
