"""IPA open tail benchmark: native host vs device (GLV Pallas) rounds.

Times a full ipa_create_proof at 2^k and asserts byte parity between
the native-host tail and the device tail (ops/ipa_device.py). The round
numbers behind the hybrid HALO2_TPU_NATIVE_IPA_THRESHOLD default live
here. Usage: python scripts/bench_ipa.py [k]
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                 (os.environ.get("JAX_PLATFORMS") or "axon").split(",")[0]))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

from halo2_tpu.curves import PALLAS  # noqa: E402
from halo2_tpu.poly import Params  # noqa: E402
from halo2_tpu.poly.commitment import ipa_create_proof  # noqa: E402
from halo2_tpu.transcript import TranscriptWrite  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    params = Params.new(PALLAS, k)
    fs = PALLAS.scalar
    df = params.scalar_df
    rng = random.Random(5)
    vals = [rng.randrange(fs.modulus) for _ in range(params.n)]
    poly = df.upload_values(vals)

    def run(tag):
        tw = TranscriptWrite(PALLAS)
        t0 = time.perf_counter()
        ipa_create_proof(params, random.Random(1), tw, poly, 1, 42)
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f}s ({dt/k:.3f}s/round)  "
              f"proof={len(tw.finalize())}B", flush=True)
        return tw.finalize()

    os.environ["HALO2_TPU_NATIVE_IPA_THRESHOLD"] = str(1 << 18)
    run("native tail (cold)")
    p_native = run("native tail (warm)")

    os.environ["HALO2_TPU_NATIVE_IPA_THRESHOLD"] = "0"
    run("device tail (cold)")
    p_dev = run("device tail (warm)")

    os.environ["HALO2_TPU_NATIVE_IPA_THRESHOLD"] = "8192"
    run("hybrid tail (cold)")  # loads the handoff-path executables
    p_hyb = run("hybrid tail (warm)")

    assert p_dev == p_native == p_hyb, "transcript mismatch!"
    print("byte parity OK (native == device == hybrid)", flush=True)


if __name__ == "__main__":
    main()
