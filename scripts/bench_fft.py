"""Mirror of the reference's FFT benchmark.

Reference: halo2_proofs/benches/fft.rs:14-22 — in-place best_fft over
Fp at k = 3..19. Here both execution paths are timed: the device NTT
(jitted butterfly program / Pallas kernels on TPU) and the native host
library (OpenMP). Run: python scripts/bench_fft.py [k ...]
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

from halo2_tpu.fields import FP, FP_DEV  # noqa: E402
from halo2_tpu.ops.ntt import ntt, make_plan  # noqa: E402
from halo2_tpu.curves import native  # noqa: E402


def main():
    ks = [int(x) for x in sys.argv[1:]] or list(range(10, 19, 2))
    rng = random.Random(7)
    R = 1 << 256
    for k in ks:
        n = 1 << k
        omega = pow(FP.root_of_unity, 1 << (FP.s - k), FP.modulus)
        vals = [rng.randrange(FP.modulus) for _ in range(n)]

        # native host path
        t_host = float("nan")
        if native._load() is not None:
            idx = native.field_idx(FP)
            data = np.zeros((n, 4), np.uint64)
            for i, v in enumerate(vals):
                m = v * R % FP.modulus
                data[i] = np.frombuffer(int(m).to_bytes(32, "little"),
                                        np.uint64)
            t0 = time.perf_counter()
            native.ntt_inplace(idx, data, omega * R % FP.modulus)
            t_host = time.perf_counter() - t0

        # device path (warm: run twice, report the second)
        dev = FP_DEV.upload_values(vals)
        plan = make_plan(FP_DEV, n, omega)
        for _ in range(2):
            t0 = time.perf_counter()
            out = ntt(FP_DEV, dev, plan)
            np.asarray(out[:1])  # force full execution
            t_dev = time.perf_counter() - t0
        bf = n * k  # butterflies
        print(f"fft k={k}: native {t_host*1e3:.1f} ms "
              f"({bf/max(t_host,1e-9)/1e6:.1f} M butterfly/s)  "
              f"device {t_dev*1e3:.1f} ms "
              f"({bf/max(t_dev,1e-9)/1e6:.1f} M butterfly/s)", flush=True)


if __name__ == "__main__":
    main()
