"""End-to-end prove/verify on the attached TPU with commitments routed
through the Pallas Pippenger dispatch (ops/msm.py thresholds forced so
every commit MSM takes the new path)."""
import os
import sys
import time

# Route the K=11 Lagrange commitments (n = 2048 concrete) through the
# device Pallas Pippenger; leave the small IPA-round MSMs on the exact
# host path (they are latency-bound microscopic dispatches).
os.environ["HALO2_TPU_HOST_MSM_THRESHOLD"] = "1024"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import random
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache", "axon"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

print("backend:", jax.default_backend(), flush=True)

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_plonk_e2e import MulCircuit  # the custom-gate+permutation circuit

from halo2_tpu.curves import PALLAS
from halo2_tpu.poly import Params
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier)
from halo2_tpu.transcript import TranscriptWrite, TranscriptRead

K = 11
CURVE = PALLAS
params = Params.new(CURVE, K, use_cache=False)
fs = CURVE.scalar
circuit = MulCircuit(a=3, b=5)
pub = fs.mul(3, 5)

t0 = time.perf_counter()
vk = keygen_vk(params, circuit.without_witnesses())
pk = keygen_pk(params, vk, circuit.without_witnesses())
print(f"keygen: {time.perf_counter()-t0:.1f}s", flush=True)

repeats = int(os.environ.get("HALO2_TPU_E2E_REPEAT", "1"))
for rep in range(repeats):
    t0 = time.perf_counter()
    tw = TranscriptWrite(CURVE)
    create_proof(params, pk, [circuit], [[[pub]]], random.Random(42), tw)
    proof = tw.finalize()
    print(f"prove[{rep}]: {time.perf_counter()-t0:.1f}s  "
          f"proof={len(proof)}B", flush=True)

tr = TranscriptRead(CURVE, proof)
verify_proof(params, vk, SingleVerifier(params), [[[pub]]], tr)
print("verify: OK", flush=True)

# negative probe: wrong public input must fail
tr = TranscriptRead(CURVE, proof)
try:
    verify_proof(params, vk, SingleVerifier(params),
                 [[[(pub + 1) % fs.modulus]]], tr)
    print("NEGATIVE PROBE FAILED: wrong public input accepted")
    sys.exit(1)
except Exception as e:
    print(f"wrong-public-input rejected: {type(e).__name__}", flush=True)
print("e2e OK", flush=True)
