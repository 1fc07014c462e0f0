"""Mirror of the reference's Poseidon gadget benchmark.

Reference: halo2_gadgets/benches/poseidon.rs:139-226 — a ConstantLength
hash circuit at K=7 benched for prove/verify at widths 3/9/12 (generic
specs with 8 full rounds and 56/57 partial rounds; width 3 is the
bit-exact P128Pow5T3). Run: python scripts/bench_poseidon.py [widths...]
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
from halo2_tpu.fields import FQ  # noqa: E402  (Pallas scalar field)
from halo2_tpu.circuit import Circuit, Value  # noqa: E402
from halo2_tpu.poly.commitment import Params  # noqa: E402
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,  # noqa
                             verify_proof, SingleVerifier)
from halo2_tpu.transcript import TranscriptWrite, TranscriptRead  # noqa
from halo2_tpu.gadgets.poseidon import (P128Pow5T3, Spec, poseidon_hash,
                                        Pow5Chip,  # noqa: E402
                                        poseidon_hash_gadget)

K = 7


def make_spec(width: int) -> Spec:
    """benches/poseidon.rs MySpec<WIDTH, RATE>: x^5, 8 full + 56 partial
    rounds, Grain-generated constants (width 3 = bit-exact P128Pow5T3)."""
    if width == 3:
        return P128Pow5T3()

    class MySpec(Spec):
        t = width
        rate = width - 1

        def full_rounds(self):
            return 8

        def partial_rounds(self):
            return 56

        def sbox(self, spec, v):
            return pow(v, 5, spec.modulus)

        def secure_mds(self):
            return 0

    return MySpec()


def make_circuit_cls(spec: Spec):
    class HashCircuit(Circuit):
        def __init__(self, message=None):
            self.message = message

        def without_witnesses(self):
            return HashCircuit()

        @classmethod
        def configure(cls, meta):
            width = spec.t
            state = [meta.advice_column() for _ in range(width)]
            partial_sbox = meta.advice_column()
            rc_a = [meta.fixed_column() for _ in range(width)]
            rc_b = [meta.fixed_column() for _ in range(width)]
            constants = meta.fixed_column()
            meta.enable_constant(constants)
            instance = meta.instance_column()
            meta.enable_equality(instance)
            message_col = meta.advice_column()
            meta.enable_equality(message_col)
            pow5 = Pow5Chip.configure(meta, spec, FQ, state, partial_sbox,
                                      rc_a, rc_b)
            return {"pow5": pow5, "instance": instance,
                    "message": message_col}

        def synthesize(self, config, layouter):
            chip = Pow5Chip(config["pow5"])
            rate = spec.rate

            def load_message(region):
                cells = []
                for i in range(rate):
                    m = (self.message[i] if self.message is not None
                         else None)
                    cells.append(region.assign_advice(
                        f"m{i}", config["message"], i,
                        lambda m=m: (Value.known(m) if m is not None
                                     else Value.unknown())))
                return cells

            message = layouter.assign_region("load message", load_message)
            out = poseidon_hash_gadget(chip, layouter, message)
            layouter.constrain_instance(out.cell, config["instance"], 0)

    return HashCircuit


def main():
    widths = [int(x) for x in sys.argv[1:]] or [3, 9, 12]
    rng = random.Random(42)
    params = Params.new(PALLAS, K)
    for width in widths:
        spec = make_spec(width)
        cls = make_circuit_cls(spec)
        msg = [FQ.rand(rng) for _ in range(spec.rate)]
        expected = poseidon_hash(FQ, spec, msg)

        t0 = time.perf_counter()
        vk = keygen_vk(params, cls())
        pk = keygen_pk(params, vk, cls())
        t_keygen = time.perf_counter() - t0

        circuit = cls(msg)
        for tag in ("warm", "hot"):
            tw = TranscriptWrite(PALLAS)
            t0 = time.perf_counter()
            create_proof(params, pk, [circuit], [[[expected]]], rng, tw)
            t_prove = time.perf_counter() - t0
            proof = tw.finalize()

        t0 = time.perf_counter()
        tr = TranscriptRead(PALLAS, proof)
        verify_proof(params, vk, SingleVerifier(params), [[[expected]]], tr)
        t_verify = time.perf_counter() - t0
        print(f"poseidon width={width} K={K}: keygen {t_keygen:.2f}s "
              f"prove {t_prove:.2f}s verify {t_verify:.3f}s "
              f"({len(proof)} bytes)", flush=True)


if __name__ == "__main__":
    main()
