"""Mirror of the reference's hash-to-curve benchmark.

Reference: halo2_proofs/benches/hashtocurve.rs:13-21 — hash_to_curve
with domain prefix "z.cash:test" and message b"benchmark" on both Pasta
curves. Both of our paths are timed: the native C++ library and the
pure-Python SSWU oracle. Run: python scripts/bench_hashtocurve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halo2_tpu.curves import PALLAS, VESTA  # noqa: E402
from halo2_tpu.curves.sswu import hash_to_curve, sswu_params  # noqa: E402
from halo2_tpu.curves import native  # noqa: E402


def bench(label, fn, reps):
    fn()  # warm (compiles the native lib / builds sswu params)
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:32s} {dt * 1e6:10.1f} us/hash")


def main():
    for curve in (PALLAS, VESTA):
        if native._load() is not None:
            bench(f"{curve.name} native C++",
                  lambda c=curve: native.native_hash_to_curve(
                      c, "z.cash:test", b"benchmark"), 2000)
        bench(f"{curve.name} python oracle",
              lambda c=curve: sswu_params(c.name).hash_to_curve(
                  "z.cash:test", b"benchmark"), 20)
        # the two must agree
        if native._load() is not None:
            a = native.native_hash_to_curve(curve, "z.cash:test",
                                            b"benchmark")
            b = sswu_params(curve.name).hash_to_curve("z.cash:test",
                                                      b"benchmark")
            assert a == b, f"{curve.name}: native != oracle"


if __name__ == "__main__":
    main()
