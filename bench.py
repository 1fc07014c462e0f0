"""Benchmark driver: multi-metric perf surface on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The primary metric is the Pallas Pippenger MSM at k=16 (points/s); the
same object carries:
  - "sol_fraction": measured modmul/s over the chip's modmul
    speed-of-light (parallel/profiling.py — BASELINE.md's per-kernel
    accounting),
  - "extras": further measured metrics — compiled-NTT butterflies/s
    (with its own sol fraction) and the standard-circuit prove
    wall-clock at k=12 (benches/plonk.rs:280-320 analogue), each with
    a vs_baseline against a *measured* number from this box's native
    C++ host library (OpenMP multicore — the honest rayon stand-in;
    the reference publishes no absolute numbers, BASELINE.md).

Robustness: the TPU is attached through a tunnel with ~30-60 ms
round-trip latency that can wedge, so each measurement runs in a
subprocess under a timeout, degrading to smaller sizes and finally the
CPU/native backends, so the driver always gets a number.

Env: HALO2_TPU_BENCH_K (default 16), HALO2_TPU_BENCH_TIMEOUT (default
1200 s per attempt), HALO2_TPU_BENCH_PROVE_K (default 12, 0 disables),
HALO2_TPU_BENCH_NTT_K (default 20, 0 disables).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

RCB_MULS_PER_ADD = 14   # complete projective add ~= 12M + 2 half-muls
NTT_MULS_PER_BUTTERFLY = 1


def _setup_jax():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache",
                                   os.environ.get("JAX_PLATFORMS", "axon")
                                   .split(",")[0] or "axon"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    return jax


def _native_msm_baseline(k: int) -> float:
    """Measured points/s of the native C++ OpenMP host MSM at size 2^k
    (the rayon-CPU stand-in on this box); 0.0 if unavailable."""
    try:
        import random
        from halo2_tpu.curves.host import PALLAS
        spec = PALLAS
        rng = random.Random(7)
        n = 1 << k
        base = [spec.mul(spec.generator, i + 1) for i in range(256)]
        pts = [base[i % 256] for i in range(n)]
        scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
        spec.msm(scalars[:512], pts[:512])  # warm (loads libpasta.so)
        t0 = time.perf_counter()
        spec.msm(scalars, pts)
        return n / (time.perf_counter() - t0)
    except Exception:
        return 0.0


def _native_ntt_baseline(k: int) -> float:
    """Measured butterflies/s of the native host NTT at 2^k."""
    try:
        import numpy as np
        from halo2_tpu.curves import native
        from halo2_tpu.fields import FQ
        idx = native.field_idx(FQ)
        if idx is None:
            return 0.0
        n = 1 << k
        p = FQ.modulus
        omega = pow(FQ.root_of_unity, 1 << (FQ.s - k), p) * (1 << 256) % p
        rng = np.random.default_rng(3)
        a = rng.integers(0, 1 << 62, size=(n, 4), dtype=np.uint64)
        native.ntt_inplace(idx, a, omega)  # warm
        t0 = time.perf_counter()
        native.ntt_inplace(idx, a, omega)
        dt = time.perf_counter() - t0
        return (n // 2) * k / dt
    except Exception:
        return 0.0


def worker(k: int) -> None:
    """Runs in a subprocess: measure MSM (+NTT) and print the JSON."""
    import random
    import numpy as np
    jax = _setup_jax()
    import jax.numpy as jnp

    from halo2_tpu.curves import PALLAS
    from halo2_tpu.fields.device import FP_DEV, FQ_DEV
    from halo2_tpu.ops.msm_pallas import (
        msm_pallas_window_sums_async, host_horner_combine, points_to_proj,
        points_from_proj)
    from halo2_tpu.parallel.profiling import modmul_speed_of_light

    sol = modmul_speed_of_light()
    n = 1 << k
    spec = PALLAS
    df = FP_DEV
    rng = random.Random(7)

    base_pts = [spec.mul(spec.generator, i + 1) for i in range(256)]
    pts = [base_pts[i % 256] for i in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    digits = jnp.asarray(np.stack([
        np.array([(s >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
        for s in scalars]))
    proj = jax.device_put(points_to_proj(spec, df, pts))

    # warm-up (compile) + correctness spot check. aff=proj[:32]: bench
    # points are affine with coded identity (points_to_proj), matching
    # the production commit path (Params.commit_many) — mixed adds.
    wsums, c = msm_pallas_window_sums_async(spec, df, digits, proj,
                                            aff=proj[:32])
    res = host_horner_combine(spec, points_from_proj(spec, df, wsums), c)
    assert res is not None

    iters = int(os.environ.get("HALO2_TPU_BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        wsums, c = msm_pallas_window_sums_async(spec, df, digits, proj,
                                                aff=proj[:32])
        outs.append(wsums)
    results = [host_horner_combine(spec, points_from_proj(spec, df, w), c)
               for w in outs]
    dt = (time.perf_counter() - t0) / iters
    points_per_s = n / dt
    assert all(r == results[0] for r in results)

    # measured CPU baseline: this box's native OpenMP MSM at the same k
    cpu_pts_per_s = _native_msm_baseline(k)
    # point-adds/s from the Pippenger op count at the window size the
    # measured kernel actually used: ~n adds per window. sol_fraction
    # keeps the COMPLETE-add (14-mul) accounting so it stays comparable
    # across rounds (the algorithmic work at reference-formula cost);
    # vpu_fraction divides the ACTUAL mixed-add mul rate by the
    # implemented CIOS kernel's real VPU roofline
    # (parallel/profiling.modmul_vpu_ops_measured).
    from halo2_tpu.parallel.profiling import modmul_vpu_ops_measured
    windows = -(-256 // c)
    adds_per_point = windows + 1
    msm_modmuls = points_per_s * adds_per_point * RCB_MULS_PER_ADD
    # the round loop uses mixed (Z2=1) adds in BOTH digit modes
    actual_muls_per_add = 11
    vpu_peak = modmul_speed_of_light(
        int_ops_per_mul=modmul_vpu_ops_measured())
    vpu_fraction = (points_per_s * adds_per_point * actual_muls_per_add
                    / vpu_peak)

    out = {
        "metric": f"msm_k{k}_points_per_s",
        "value": round(points_per_s, 2),
        "unit": "points/s",
        "vs_baseline": (round(points_per_s / cpu_pts_per_s, 4)
                        if cpu_pts_per_s else 0.0),
        "baseline": "native_host_msm_measured",
        "baseline_points_per_s": round(cpu_pts_per_s, 2),
        "sol_fraction": round(msm_modmuls / sol, 4),
        "vpu_fraction": round(vpu_fraction, 4),
        "extras": [],
    }

    # ---- compiled-NTT throughput ----
    ntt_k = int(os.environ.get("HALO2_TPU_BENCH_NTT_K", "20"))
    if ntt_k:
        try:
            from halo2_tpu.ops.ntt import make_plan
            from halo2_tpu.poly.domain import _ntt_dispatch
            from halo2_tpu.fields import FQ
            dfq = FQ_DEV
            m = 1 << ntt_k
            omega = pow(FQ.root_of_unity, 1 << (FQ.s - ntt_k), FQ.modulus)
            plan = make_plan(dfq, m, omega)
            vals = np.random.default_rng(5).integers(
                0, 1 << 16, size=(m, 16)).astype(np.uint32)
            x = jnp.asarray(vals)
            ntt_jit = jax.jit(lambda v: _ntt_dispatch(dfq, v, plan))
            y = ntt_jit(x)                           # compile
            np.asarray(y[:1])                        # sync
            t0 = time.perf_counter()
            y = ntt_jit(x)
            np.asarray(y[:1])                        # full readback sync
            ndt = time.perf_counter() - t0
            bfs = (m // 2) * ntt_k / ndt
            ntt_base = _native_ntt_baseline(ntt_k)
            # two rooflines: modmul compute SoL and HBM-bandwidth SoL
            # (bytes the compiled program actually moves / wall-clock /
            # peak bandwidth) — VERDICT r4 'honest NTT roofline'
            from halo2_tpu.parallel.profiling import bandwidth_fraction
            bw_frac = bandwidth_fraction(ntt_jit, (x,), ndt)
            out["extras"].append({
                "metric": f"ntt_k{ntt_k}_butterflies_per_s",
                "value": round(bfs, 2),
                "unit": "butterflies/s",
                "vs_baseline": (round(bfs / ntt_base, 4)
                                if ntt_base else 0.0),
                "baseline": "native_host_ntt_measured",
                "sol_fraction": round(
                    bfs * NTT_MULS_PER_BUTTERFLY / sol, 4),
                "bw_fraction": round(bw_frac, 4),
            })
        except Exception as e:  # pragma: no cover - best effort
            out["extras"].append({"metric": f"ntt_k{ntt_k}_error",
                                  "value": 0, "unit": str(e)[:120],
                                  "vs_baseline": 0.0})

    print(json.dumps(out), flush=True)


def prove_worker(k: int) -> None:
    """Standard-circuit prove wall-clock at 2^k rows (the plonk.rs
    criterion bench analogue): keygen once, prove twice (first warms
    compiles), report the warm prove seconds."""
    import random
    _setup_jax()
    from halo2_tpu.curves import PALLAS
    from halo2_tpu.transcript import TranscriptWrite, TranscriptRead
    from halo2_tpu.poly import Params
    from halo2_tpu.poly.polynomial import Rotation
    from halo2_tpu.circuit import Circuit, Value
    from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                                 verify_proof, SingleVerifier)
    fs = PALLAS.scalar

    class BenchCircuit(Circuit):
        """a*b gate + copy chain + public input: the standard-PLONK
        shape of benches/plonk.rs:21-270 at minimal column count."""

        def __init__(self, a=None):
            self.a = a

        def without_witnesses(self):
            return BenchCircuit()

        @classmethod
        def configure(cls, meta):
            col_a = meta.advice_column()
            col_b = meta.advice_column()
            instance = meta.instance_column()
            s_mul = meta.selector()
            meta.enable_equality(col_a)
            meta.enable_equality(instance)

            def gate(cells):
                a = cells.query_advice(col_a, Rotation(0))
                b = cells.query_advice(col_b, Rotation(0))
                o = cells.query_advice(col_a, Rotation(1))
                s = cells.query_selector(s_mul)
                return [("m", s * (a * b - o))]

            meta.create_gate("m", gate)
            return {"a": col_a, "b": col_b, "i": instance, "s": s_mul}

        def synthesize(self, config, layouter):
            out = None
            cur = self.a
            for i in range(16):
                def rf(region, cur=cur, prev=out):
                    region.enable_selector("s", config["s"], 0)
                    c = region.assign_advice(
                        "a", config["a"], 0,
                        lambda: Value.known(cur) if cur is not None
                        else Value.unknown())
                    if prev is not None:
                        region.constrain_equal(c.cell, prev.cell)
                    region.assign_advice("b", config["b"], 0,
                                         lambda: Value.known(3))
                    nx = fs.mul(cur, 3) if cur is not None else None
                    return region.assign_advice(
                        "o", config["a"], 1,
                        lambda v=nx: Value.known(v) if v is not None
                        else Value.unknown())
                out = layouter.assign_region("m", rf)
                if cur is not None:
                    cur = fs.mul(cur, 3)
            layouter.constrain_instance(out.cell, config["i"], 0)

    params = Params.new(PALLAS, k)
    circuit = BenchCircuit(5)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    expected = 5
    for _ in range(16):
        expected = fs.mul(expected, 3)

    def prove(seed):
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [[[expected]]],
                     random.Random(seed), tw)
        return tw.finalize()

    prove(1)  # warm: compiles every phase executable
    t0 = time.perf_counter()
    proof = prove(2)
    dt = time.perf_counter() - t0
    tr = TranscriptRead(PALLAS, proof)
    verify_proof(params, vk, SingleVerifier(params), [[[expected]]], tr)

    print(json.dumps({
        "metric": f"plonk_prove_k{k}_s",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": 0.0,
        "note": "warm prove wall-clock, verified; no published "
                "reference number (BASELINE.md)",
    }), flush=True)


def native_worker(k: int) -> None:
    """Wedged-tunnel fallback: measure the native C++ host MSM."""
    import random

    from halo2_tpu.curves.host import PALLAS

    spec = PALLAS
    rng = random.Random(7)
    n = 1 << k
    base = [spec.mul(spec.generator, i + 1) for i in range(256)]
    pts = [base[i % 256] for i in range(n)]
    scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
    spec.msm(scalars[:512], pts[:512])  # warm (compiles libpasta.so)
    iters = int(os.environ.get("HALO2_TPU_BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    outs = [spec.msm(scalars, pts) for _ in range(iters)]
    dt = (time.perf_counter() - t0) / iters
    assert all(o == outs[0] for o in outs)
    print(json.dumps({
        "metric": f"msm_host_native_k{k}_points_per_s",
        "value": round(n / dt, 2),
        "unit": "points/s",
        "vs_baseline": 1.0,
        "baseline": "self (native host)",
    }), flush=True)


def _run_sub(mode: str, kk: int, env, timeout):
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), mode, str(kk)],
            env=env, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return None
    for line in (out.stdout or "").splitlines():
        line = line.strip()
        if line.startswith("{") and "metric" in line:
            return json.loads(line)
    return None


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--native-worker":
        native_worker(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--prove-worker":
        prove_worker(int(sys.argv[2]))
        return

    k = int(os.environ.get("HALO2_TPU_BENCH_K", "16"))
    timeout = int(os.environ.get("HALO2_TPU_BENCH_TIMEOUT", "1200"))
    attempts = [("--worker", k, None), ("--worker", k, None),
                ("--worker", max(k - 2, 8), None), ("--worker", 9, "cpu")]
    tunnel_up = True
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True,
            timeout=int(os.environ.get("HALO2_TPU_PROBE_TIMEOUT", "120")),
            check=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        tunnel_up = False
        attempts = [("--native-worker", k, None),
                    ("--native-worker", 11, None), ("--worker", 9, "cpu")]

    primary = None
    for mode, kk, platform in attempts:
        env = dict(os.environ)
        if platform:
            env["JAX_PLATFORMS"] = platform
        primary = _run_sub(mode, kk, env, timeout)
        if primary:
            break

    if primary is None:
        # last resort: host-python measurement
        import random
        from halo2_tpu.curves import PALLAS
        spec = PALLAS
        rng = random.Random(7)
        n = 256
        pts = [spec.mul(spec.generator, i + 1) for i in range(n)]
        scalars = [rng.randrange(spec.scalar.modulus) for _ in range(n)]
        t0 = time.perf_counter()
        spec.msm(scalars, pts)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "msm_hostfallback_points_per_s",
            "value": round(n / dt, 2),
            "unit": "points/s",
            "vs_baseline": 0.0,
        }), flush=True)
        return

    # prover wall-clock (separate subprocess so a hang cannot cost the
    # primary metric)
    prove_k = int(os.environ.get("HALO2_TPU_BENCH_PROVE_K", "12"))
    if tunnel_up and prove_k:
        prove_timeout = int(os.environ.get(
            "HALO2_TPU_BENCH_PROVE_TIMEOUT", "1200"))
        got = _run_sub("--prove-worker", prove_k, dict(os.environ),
                       prove_timeout)
        if got:
            primary.setdefault("extras", []).append(got)

    print(json.dumps(primary), flush=True)


if __name__ == "__main__":
    main()
