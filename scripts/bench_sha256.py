"""Mirror of the reference's SHA-256 gadget benchmark.

Reference: halo2_gadgets/benches/sha256.rs:148-150 — the Table16 chip
hashing a 2-block (31×BlockWord) preimage at k=17, benched for
keygen / prove / verify. Run: python scripts/bench_sha256.py [k]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.curves import PALLAS  # noqa: E402
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.poly.commitment import Params  # noqa: E402
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,  # noqa
                             verify_proof, SingleVerifier)
from halo2_tpu.transcript import TranscriptWrite, TranscriptRead  # noqa
from halo2_tpu.gadgets.sha256 import Sha256, BlockWord  # noqa: E402
from halo2_tpu.gadgets.sha256.table16 import Table16Chip  # noqa: E402


class Sha256Circuit(Circuit):
    """benches/sha256.rs MyCircuit: update with 31 words (2 blocks)."""

    def without_witnesses(self):
        return Sha256Circuit()

    @classmethod
    def configure(cls, meta):
        return Table16Chip.configure(meta)

    def synthesize(self, config, layouter):
        Table16Chip.load(config, layouter)
        chip = Table16Chip(config)
        sha = Sha256(chip, layouter)
        sha.update([BlockWord(Value.known(0b01111000))] * 31)
        sha.finalize()


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    rng = random.Random(42)
    t0 = time.perf_counter()
    params = Params.new(PALLAS, k)
    t_params = time.perf_counter() - t0

    t0 = time.perf_counter()
    vk = keygen_vk(params, Sha256Circuit())
    pk = keygen_pk(params, vk, Sha256Circuit())
    t_keygen = time.perf_counter() - t0

    circuit = Sha256Circuit()
    tw = TranscriptWrite(PALLAS)
    t0 = time.perf_counter()
    create_proof(params, pk, [circuit], [[]], rng, tw)
    t_prove = time.perf_counter() - t0
    proof = tw.finalize()

    # second prove in-process: the steady-state number — the first one
    # pays a per-executable load through the device tunnel (10-30 s per
    # distinct compiled shape on this runtime), which a resident prover
    # service pays once
    tw2 = TranscriptWrite(PALLAS)
    t0 = time.perf_counter()
    create_proof(params, pk, [Sha256Circuit()], [[]], rng, tw2)
    t_prove_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    tr = TranscriptRead(PALLAS, proof)
    verify_proof(params, vk, SingleVerifier(params), [[]], tr)
    t_verify = time.perf_counter() - t0
    print(f"sha256 k={k}: params {t_params:.2f}s keygen {t_keygen:.2f}s "
          f"prove {t_prove:.2f}s prove_warm {t_prove_warm:.2f}s "
          f"verify {t_verify:.3f}s ({len(proof)} bytes)", flush=True)


if __name__ == "__main__":
    main()
