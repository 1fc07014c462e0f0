"""Mesh scaling efficiency: sharded MSM / four-step NTT throughput vs
device count.

The BASELINE north star asks for >= 70% ops/s scaling efficiency on a
multi-host slice (SURVEY.md §5.7/§5.8). Real multi-chip hardware is not
attached in this environment, so this script measures the *sharded
kernels themselves* against a mesh of whatever devices exist — the 8
virtual CPU devices in CI (functional scaling shape, not absolute
perf), or a real slice when one is attached (JAX_PLATFORMS=tpu on a
pod). Efficiency = throughput(D) / (D * throughput(1)).

Usage: python scripts/bench_mesh_scaling.py [k] [device counts...]
       (defaults: k=14 on CPU-mesh, 1 2 4 8)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# virtual CPU mesh unless a real multi-device backend is present
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                 (os.environ.get("JAX_PLATFORMS") or "cpu").split(",")[0]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import random  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ndev = 2  # child mode: devices already forced below
    if os.environ.get("HALO2_TPU_SCALING_CHILD") != "1":
        try:
            ndev = len(jax.devices())
        except RuntimeError:
            ndev = 0  # unreachable accelerator backend: fall to CPU mesh
    if ndev < 2 and os.environ.get("HALO2_TPU_SCALING_CHILD") \
            != "1":
        # the axon sitecustomize pre-imports jax before our XLA_FLAGS
        # take effect (same dance as __graft_entry__.dryrun_multichip):
        # re-exec with the flags in the environment
        import subprocess
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        env.pop("JAX_PLATFORMS", None)
        env["HALO2_TPU_SCALING_CHILD"] = "1"
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env).returncode)
    from halo2_tpu.curves import PALLAS, PALLAS_DEV
    from halo2_tpu.curves.device import JPoint
    from halo2_tpu.fields import FQ, FQ_DEV
    from halo2_tpu.parallel import (make_mesh, sharded_msm, sharded_ntt,
                                    ShardedNttPlan, AXIS)
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    counts = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]
    counts = [d for d in counts if d <= len(jax.devices())]
    n = 1 << k
    df, cv, fs = FQ_DEV, PALLAS_DEV, FQ
    rng = random.Random(3)

    vals = [rng.randrange(fs.modulus) for _ in range(n)]
    x_host = np.asarray(df.to_mont_np(vals)).reshape(n, 16)
    pts = [PALLAS.mul(PALLAS.generator, (i % 1024) + 1) for i in range(n)]
    jp_host = cv.points_to_device(pts)
    scalars = [rng.randrange(fs.modulus) for _ in range(n)]
    digits_host = np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars])
    omega = pow(fs.root_of_unity, 1 << (fs.s - k), fs.modulus)

    base = {}
    rows = []
    for d in counts:
        if n % (d * d):
            print(f"D={d}: skipped (D^2 does not divide n)")
            continue
        mesh = make_mesh(d)
        shard = NamedSharding(mesh, P(AXIS))
        x = jax.device_put(jnp.asarray(x_host), shard)
        digits = jax.device_put(jnp.asarray(digits_host), shard)
        jp = JPoint(jax.device_put(jp_host.x, shard),
                    jax.device_put(jp_host.y, shard),
                    jax.device_put(jp_host.z, shard))
        plan = ShardedNttPlan(df, n, omega, d)

        # warm (compile)
        y = sharded_ntt(df, mesh, plan, x)
        np.asarray(y[:1])
        t = sharded_msm(cv, mesh, digits, jp)
        np.asarray(t.x)

        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            y = sharded_ntt(df, mesh, plan, x)
        np.asarray(y[:1])
        ntt_s = (time.perf_counter() - t0) / iters

        t0 = time.perf_counter()
        for _ in range(iters):
            t = sharded_msm(cv, mesh, digits, jp)
        np.asarray(t.x)
        msm_s = (time.perf_counter() - t0) / iters

        base.setdefault("ntt", ntt_s * d if d == counts[0] else None)
        base.setdefault("msm", msm_s * d if d == counts[0] else None)
        d0 = counts[0]
        eff_n = (base["ntt"] / (ntt_s * d)) if base["ntt"] else float("nan")
        eff_m = (base["msm"] / (msm_s * d)) if base["msm"] else float("nan")
        print(f"D={d}: ntt {ntt_s*1e3:8.1f} ms (eff {eff_n:5.2f})   "
              f"msm {msm_s*1e3:8.1f} ms (eff {eff_m:5.2f})   "
              f"[vs D={d0}]", flush=True)
        rows.append({"D": d, "ntt_s": round(ntt_s, 5),
                     "msm_s": round(msm_s, 5),
                     "ntt_eff": round(eff_n, 4),
                     "msm_eff": round(eff_m, 4)})

    # machine-readable artifact (MESH_SCALING_r{N}.json). On the virtual
    # CPU mesh the D devices OVERSUBSCRIBE the same physical cores, so
    # eff < 1 measures XLA-CPU scheduling + collective overhead, not
    # chip scaling — the honest caveat the artifact must carry.
    import json
    ncpu = os.cpu_count() or 0
    platform = jax.default_backend()
    print(json.dumps({
        "metric": f"mesh_scaling_k{k}",
        "value": rows[-1]["msm_eff"] if rows else 0.0,
        "unit": "efficiency_vs_D1",
        "vs_baseline": 0.0,
        "platform": platform,
        "physical_cpus": ncpu,
        "oversubscribed": platform == "cpu" and counts
        and max(counts) > max(1, ncpu),
        "note": ("virtual CPU mesh: devices share physical cores, so "
                 "efficiency measures collective/scheduling overhead, "
                 "not chip scaling" if platform == "cpu" else
                 "real device mesh"),
        "rows": rows,
    }), flush=True)


if __name__ == "__main__":
    main()
