"""Mirror of the reference's primitives benchmark.

Reference: halo2_gadgets/benches/primitives.rs:13-60 — off-circuit
Poseidon 2-to-1 hash (P128Pow5T3 over Pallas base) and Sinsemilla
HashDomain/CommitDomain at the Orchard input sizes 510/520/1086 bits.
Run: python scripts/bench_primitives.py
"""
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halo2_tpu.fields import FP  # noqa: E402  (Pallas base field)
from halo2_tpu.gadgets.poseidon.primitive import (  # noqa: E402
    P128Pow5T3, poseidon_hash)
from halo2_tpu.gadgets.sinsemilla import primitive as sinsemilla  # noqa


def bench(label, fn, reps):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:36s} {dt * 1e6:10.1f} us")


def main():
    rng = random.Random(7)
    msg = [rng.randrange(FP.modulus), rng.randrange(FP.modulus)]
    spec = P128Pow5T3()
    bench("Poseidon/2-to-1", lambda: poseidon_hash(FP, spec, msg), 50)

    hasher = sinsemilla.HashDomain("hasher")
    committer = sinsemilla.CommitDomain("committer")
    bits = [bool(rng.getrandbits(1)) for _ in range(1086)]
    r = rng.randrange(FP.modulus)
    for size in (510, 520, 1086):
        bench(f"Sinsemilla/hash-to-point/{size}",
              lambda s=size: hasher.hash_to_point(bits[:s]), 20)
        bench(f"Sinsemilla/hash/{size}",
              lambda s=size: hasher.hash(bits[:s]), 20)
        bench(f"Sinsemilla/commit/{size}",
              lambda s=size: committer.commit(bits[:s], r), 20)
        bench(f"Sinsemilla/short-commit/{size}",
              lambda s=size: committer.short_commit(bits[:s], r), 20)


if __name__ == "__main__":
    main()
