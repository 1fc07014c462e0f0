"""Mirror of the reference's headline PLONK benchmark.

Reference: halo2_proofs/benches/plonk.rs — the StandardPlonk circuit
(3 advice a/b/c with equality, 4 fixed sa/sb/sc/sm, one combined
add-mult gate, set_minimum_degree(5)); synthesis runs
2^(k-1) - 3 iterations of {raw_multiply, raw_add, 2 copies}; benched
over k = 8..=16 for keygen / prover / verifier.

Usage: python scripts/bench_plonk.py [k ...]   (default: 8 11)
Env:   JAX_PLATFORMS=cpu to force host; HALO2_TPU_PROF=1 for the
       per-phase prover breakdown.
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

from halo2_tpu.curves import VESTA  # noqa: E402  (EqAffine = Eq = Vesta)
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.poly.polynomial import Rotation  # noqa: E402
from halo2_tpu.poly.commitment import Params  # noqa: E402
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,  # noqa
                             verify_proof, SingleVerifier)
from halo2_tpu.transcript import TranscriptWrite, TranscriptRead  # noqa

FP = VESTA.scalar  # circuit field Fp (reference benches over EqAffine/Fp)


class StandardPlonk:
    """StandardCs impl (benches/plonk.rs:71-168)."""

    def __init__(self, config):
        self.cfg = config

    def raw_multiply(self, layouter, f):
        cfg = self.cfg

        def region_fn(region):
            v = f()
            lhs = region.assign_advice("lhs", cfg["a"], 0, lambda: v[0])
            rhs = region.assign_advice("rhs", cfg["b"], 0, lambda: v[1])
            out = region.assign_advice("out", cfg["c"], 0, lambda: v[2])
            region.assign_fixed("a", cfg["sa"], 0, lambda: 0)
            region.assign_fixed("b", cfg["sb"], 0, lambda: 0)
            region.assign_fixed("c", cfg["sc"], 0, lambda: 1)
            region.assign_fixed("a*b", cfg["sm"], 0, lambda: 1)
            return lhs.cell, rhs.cell, out.cell
        return layouter.assign_region("raw_multiply", region_fn)

    def raw_add(self, layouter, f):
        cfg = self.cfg

        def region_fn(region):
            v = f()
            lhs = region.assign_advice("lhs", cfg["a"], 0, lambda: v[0])
            rhs = region.assign_advice("rhs", cfg["b"], 0, lambda: v[1])
            out = region.assign_advice("out", cfg["c"], 0, lambda: v[2])
            region.assign_fixed("a", cfg["sa"], 0, lambda: 1)
            region.assign_fixed("b", cfg["sb"], 0, lambda: 1)
            region.assign_fixed("c", cfg["sc"], 0, lambda: 1)
            region.assign_fixed("a*b", cfg["sm"], 0, lambda: 0)
            return lhs.cell, rhs.cell, out.cell
        return layouter.assign_region("raw_add", region_fn)

    def copy(self, layouter, left, right):
        def region_fn(region):
            region.constrain_equal(left, right)
        return layouter.assign_region("copy", region_fn)


class MyCircuit(Circuit):
    def __init__(self, a=None, k=8):
        self.a = a
        self.k = k

    def without_witnesses(self):
        return MyCircuit(a=None, k=self.k)

    @classmethod
    def configure(cls, meta):
        meta.set_minimum_degree(5)
        a = meta.advice_column()
        b = meta.advice_column()
        c = meta.advice_column()
        meta.enable_equality(a)
        meta.enable_equality(b)
        meta.enable_equality(c)
        sm = meta.fixed_column()
        sa = meta.fixed_column()
        sb = meta.fixed_column()
        sc = meta.fixed_column()

        def gate(cells):
            qa = cells.query_advice(a, Rotation(0))
            qb = cells.query_advice(b, Rotation(0))
            qc = cells.query_advice(c, Rotation(0))
            qsa = cells.query_fixed(sa)
            qsb = cells.query_fixed(sb)
            qsc = cells.query_fixed(sc)
            qsm = cells.query_fixed(sm)
            return [("", qa * qsa + qb * qsb + qa * qb * qsm - qc * qsc)]
        meta.create_gate("Combined add-mult", gate)
        return {"a": a, "b": b, "c": c, "sa": sa, "sb": sb, "sc": sc,
                "sm": sm}

    def synthesize(self, config, layouter):
        cs = StandardPlonk(config)
        a = self.a
        known = a is not None
        a2 = (a * a % FP.modulus) if known else None
        fin = ((a2 + a) % FP.modulus) if known else None
        mult_v = ((Value.known(a), Value.known(a), Value.known(a2))
                  if known else (Value.unknown(),) * 3)
        add_v = ((Value.known(a), Value.known(a2), Value.known(fin))
                 if known else (Value.unknown(),) * 3)
        for _ in range((1 << (self.k - 1)) - 3):
            a0, _b0, c0 = cs.raw_multiply(layouter, lambda: mult_v)
            a1, b1, _c1 = cs.raw_add(layouter, lambda: add_v)
            cs.copy(layouter, a0, a1)
            cs.copy(layouter, b1, c0)


def main():
    ks = [int(x) for x in sys.argv[1:]] or [8, 11]
    rng = random.Random(42)
    for k in ks:
        t0 = time.perf_counter()
        params = Params.new(VESTA, k)
        t_params = time.perf_counter() - t0

        empty = MyCircuit(a=None, k=k)
        t0 = time.perf_counter()
        vk = keygen_vk(params, empty)
        pk = keygen_pk(params, vk, empty)
        t_keygen = time.perf_counter() - t0

        circuit = MyCircuit(a=FP.rand(rng), k=k)
        # warm run (compile), then timed
        for tag in ("warm", "hot"):
            tw = TranscriptWrite(VESTA)
            t0 = time.perf_counter()
            create_proof(params, pk, [circuit], [[]], rng, tw)
            t_prove = time.perf_counter() - t0
            proof = tw.finalize()
            print(f"k={k} [{tag}] prove: {t_prove:.2f}s "
                  f"({len(proof)} bytes)", flush=True)

        t0 = time.perf_counter()
        strategy = SingleVerifier(params)
        tr = TranscriptRead(VESTA, proof)
        verify_proof(params, vk, strategy, [[]], tr)  # raises on failure
        t_verify = time.perf_counter() - t0
        print(f"k={k} params: {t_params:.2f}s keygen: {t_keygen:.2f}s "
              f"prove: {t_prove:.2f}s verify: {t_verify:.2f}s", flush=True)


if __name__ == "__main__":
    main()
