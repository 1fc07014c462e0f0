"""Machine-readable full bench surface: all five BASELINE.md configs.

Runs the per-config mirror scripts (plonk k=8..16, poseidon widths
3/9/12, sha256 k=17, dev_lookup k=14, simple-example) as subprocesses
under timeouts, parses their stable output lines, and writes ONE
structured JSON artifact — the criterion analogue of
/root/reference/halo2_proofs/benches/plonk.rs:280-320 emitting
per-config results that scripts/bench_compare.py can gate.

Usage: python scripts/bench_full.py [out.json]
Env:   HALO2_TPU_BENCH_FULL_TIMEOUT (default 2400 s per config),
       HALO2_TPU_BENCH_FULL_PLONK_KS (default "8 12 16").
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run(script: str, args, timeout: int) -> str:
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, script), *args],
            capture_output=True, text=True, timeout=timeout,
            cwd=REPO)
        return out.stdout or ""
    except subprocess.TimeoutExpired as e:
        return (e.stdout or b"").decode() if isinstance(
            e.stdout, bytes) else (e.stdout or "")


def add(metrics, name, value, unit="s"):
    if value is not None:
        metrics.append({"metric": name, "value": float(value),
                        "unit": unit, "vs_baseline": 0.0})


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_FULL.json")
    timeout = int(os.environ.get("HALO2_TPU_BENCH_FULL_TIMEOUT", "2400"))
    metrics = []
    t_start = time.time()

    # 1. plonk k=8..16 keygen/prove/verify (plonk.rs:280-320)
    ks = os.environ.get("HALO2_TPU_BENCH_FULL_PLONK_KS", "8 12 16").split()
    text = run("bench_plonk.py", ks, timeout)
    for m in re.finditer(
            r"k=(\d+) params: ([\d.]+)s keygen: ([\d.]+)s "
            r"prove: ([\d.]+)s verify: ([\d.]+)s", text):
        k = m.group(1)
        add(metrics, f"plonk_k{k}_keygen_s", m.group(3))
        add(metrics, f"plonk_k{k}_prove_s", m.group(4))
        add(metrics, f"plonk_k{k}_verify_s", m.group(5))

    # 2. poseidon widths 3/9/12 at K=7 (poseidon.rs:139-226)
    text = run("bench_poseidon.py", ["3", "9", "12"], timeout)
    for m in re.finditer(
            r"poseidon width=(\d+) K=\d+: keygen ([\d.]+)s "
            r"prove ([\d.]+)s verify ([\d.]+)s", text):
        w = m.group(1)
        add(metrics, f"poseidon_w{w}_prove_s", m.group(3))
        add(metrics, f"poseidon_w{w}_verify_s", m.group(4))

    # 3. sha256 k=17 (sha256.rs:148-150)
    text = run("bench_sha256.py", ["17"], timeout)
    for m in re.finditer(
            r"sha256 k=(\d+): params [\d.]+s keygen ([\d.]+)s "
            r"prove ([\d.]+)s prove_warm ([\d.]+)s verify ([\d.]+)s",
            text):
        k = m.group(1)
        add(metrics, f"sha256_k{k}_keygen_s", m.group(2))
        add(metrics, f"sha256_k{k}_prove_fresh_s", m.group(3))
        add(metrics, f"sha256_k{k}_prove_warm_s", m.group(4))
        add(metrics, f"sha256_k{k}_verify_s", m.group(5))

    # 4. dev_lookup MockProver (dev_lookup.rs)
    text = run("bench_dev_lookup.py", ["14"], timeout)
    for m in re.finditer(
            r"dev-lookup k=(\d+): MockProver run\+verify ([\d.]+)s",
            text):
        add(metrics, f"dev_lookup_k{m.group(1)}_mock_s", m.group(2))

    # 5. simple-example (the book's first circuit): bench.py's
    # prove-worker is exactly that shape at k=HALO2_TPU_BENCH_PROVE_K
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--prove-worker", "12"],
            capture_output=True, text=True, timeout=timeout, cwd=REPO)
        for line in (out.stdout or "").splitlines():
            if line.startswith("{"):
                d = json.loads(line)
                add(metrics, "simple_example_prove_k12_s", d["value"])
    except subprocess.TimeoutExpired:
        pass

    artifact = {
        "metric": "bench_full_configs",
        "value": len(metrics),
        "unit": "metrics",
        "vs_baseline": 0.0,
        "wall_s": round(time.time() - t_start, 1),
        "extras": metrics,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
