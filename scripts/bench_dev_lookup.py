"""Mirror of the reference's MockProver lookup benchmark.

Reference: halo2_proofs/benches/dev_lookup.rs — an 8-bit lookup table
with 2^10 looked-up advice rows, MockProver::run + verify at
k = 14..=18. Run: python scripts/bench_dev_lookup.py [k ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # MockProver is host+vmap
import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from halo2_tpu.fields import FP  # noqa: E402  (pallas::Base)
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.plonk.circuit import Constant  # noqa: E402
from halo2_tpu.poly.polynomial import Rotation  # noqa: E402
from halo2_tpu.dev import MockProver  # noqa: E402


class MyCircuit(Circuit):
    def without_witnesses(self):
        return MyCircuit()

    @classmethod
    def configure(cls, meta):
        selector = meta.complex_selector()
        table = meta.lookup_table_column()
        advice = meta.advice_column()

        def lookup(cells):
            s = cells.query_selector(selector)
            adv = cells.query_advice(advice, Rotation(0))
            return [(s * adv + (Constant(1) - s), table)]

        meta.lookup("lookup", lookup)
        return {"selector": selector, "table": table, "advice": advice}

    def synthesize(self, config, layouter):
        def fill_table(table):
            for row in range(1 << 8):
                table.assign_cell(f"row {row}", config["table"], row,
                                  lambda row=row: Value.known(row + 1))
        layouter.assign_table("8-bit table", fill_table)

        def assign(region):
            for offset in range(1 << 10):
                region.enable_selector("sel", config["selector"], offset)
                region.assign_advice(
                    f"offset {offset}", config["advice"], offset,
                    lambda offset=offset: Value.known((offset % 256) + 1))
        layouter.assign_region("assign values", assign)


def main():
    ks = [int(x) for x in sys.argv[1:]] or [14]
    for k in ks:
        t0 = time.perf_counter()
        prover = MockProver.run(k, MyCircuit(), [], fs=FP)
        errors = prover.verify()
        t = time.perf_counter() - t0
        assert errors in (None, []), errors
        print(f"dev-lookup k={k}: MockProver run+verify {t:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
