"""Multi-process mesh prove: 2 CPU processes x 4 virtual devices each.

The reference's runtime scales across all cores of one process
(halo2_proofs/src/multicore.rs:1-34); the TPU-native scaling axis is a
multi-PROCESS device mesh (one process per host on a real pod slice,
DCN between them). This harness demonstrates that shape without TPU
hardware: `jax.distributed.initialize` ties 2 CPU processes into one
8-device global mesh, the full k=10 prove runs under ProverMesh, and
the transcript must be byte-identical to the single-process prove
(field/group math is exact — SURVEY.md §2.6/§5.8).

Usage:  python scripts/mesh_multiprocess.py            # orchestrates
        python scripts/mesh_multiprocess.py --child N  # internal
Writes MULTIPROC JSON {"ok": bool, "match": bool, ...} on stdout.
"""
import argparse
import hashlib
import json
import os
import random
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 10
NPROC = 2
LOCAL_DEVICES = 4
SEED = 77


def _setup_env(local_devices: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    os.environ.setdefault("HALO2_TPU_HOST_MSM_THRESHOLD", "4096")


def _prove_hash(mesh=None) -> str:
    import jax
    from halo2_tpu.curves import PALLAS
    from halo2_tpu.transcript import TranscriptWrite
    from halo2_tpu.poly import Params
    from halo2_tpu.parallel import ProverMesh
    from halo2_tpu.dev.circuits import MulChainCircuit
    from halo2_tpu.plonk import keygen_vk, keygen_pk, create_proof

    params = Params.new(PALLAS, K, use_cache=False)
    circuit = MulChainCircuit(5)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    inst = [[circuit.expected_out()]]

    def run():
        tw = TranscriptWrite(PALLAS)
        create_proof(params, pk, [circuit], [inst], random.Random(SEED),
                     tw)
        return tw.finalize()

    if mesh is None:
        proof = run()
    else:
        with ProverMesh(mesh):
            proof = run()
    return hashlib.sha256(proof).hexdigest()


def child(pid: int, coord: str) -> None:
    _setup_env(LOCAL_DEVICES)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=NPROC, process_id=pid)
    from jax.sharding import Mesh
    import numpy as np
    devs = jax.devices()
    assert len(devs) == NPROC * LOCAL_DEVICES, devs
    mesh = Mesh(np.array(devs), ("shard",))
    t0 = time.time()
    h = _prove_hash(mesh)
    print(json.dumps({"pid": pid, "hash": h,
                      "ndev_global": len(devs),
                      "nproc": NPROC,
                      "prove_s": round(time.time() - t0, 2)}),
          flush=True)


def single() -> None:
    _setup_env(LOCAL_DEVICES * NPROC)
    import jax
    jax.config.update("jax_platforms", "cpu")
    print(json.dumps({"hash": _prove_hash(None)}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--coord", default=None)
    args = ap.parse_args()
    if args.single:
        single()
        return 0
    if args.child is not None:
        child(args.child, args.coord)
        return 0

    # orchestrate: golden single-process hash, then the 2-process mesh
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    me = os.path.abspath(__file__)
    env = dict(os.environ)

    out = subprocess.run([sys.executable, me, "--single"], env=env,
                         capture_output=True, text=True, timeout=2400)
    golden = None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            golden = json.loads(line)["hash"]
    if golden is None:
        print(json.dumps({"ok": False, "stage": "single",
                          "err": (out.stderr or "")[-800:]}))
        return 1

    procs = [subprocess.Popen(
        [sys.executable, me, "--child", str(i), "--coord", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(NPROC)]
    results, errs = [], []
    for p in procs:
        try:
            so, se = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            p.kill()
            so, se = p.communicate()
        errs.append((se or "")[-800:])
        for line in (so or "").splitlines():
            if line.startswith("{"):
                results.append(json.loads(line))

    ok = len(results) == NPROC
    match = ok and all(r["hash"] == golden for r in results)
    print(json.dumps({
        "ok": ok, "match": match, "golden": golden,
        "results": results,
        "errs": [] if ok and match else errs,
    }))
    return 0 if (ok and match) else 1


if __name__ == "__main__":
    sys.exit(main())
