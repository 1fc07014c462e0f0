"""Surgical ECC-parity differ: extract our fixed columns after keygen
assembly + selector compression, commit each on host, and compare
against the golden vk_ecc_chip.rdata commitment list. Then test global
row-shift hypotheses on the first mismatching columns."""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from types import SimpleNamespace
from test_ecc_parity import EccMirrorCircuit, GOLDEN

from halo2_tpu.fields import FQ
from halo2_tpu.curves import VESTA
from halo2_tpu.poly import Params
from halo2_tpu.plonk.circuit import ConstraintSystem
from halo2_tpu.plonk.keygen import Assembly
from halo2_tpu.plonk.compress_selectors import compress_selectors
from halo2_tpu.plonk.assigned import batch_evaluate_assigned
from halo2_tpu.circuit import synthesize_circuit

K = 11
N = 1 << K


def our_columns():
    cs = ConstraintSystem()
    circuit = EccMirrorCircuit(False)
    config = type(circuit).configure(cs)
    params = SimpleNamespace(n=N, k=K)
    assembly = Assembly(cs, params, FQ)
    synthesize_circuit(assembly, circuit, config, cs.constants)
    cs2, selector_polys = compress_selectors(cs, assembly.selectors)
    cols = [batch_evaluate_assigned(FQ, col) for col in assembly.fixed]
    for poly in selector_polys:
        cols.append([int(x) for x in poly])
    return cols


def golden_commitments():
    text = open(os.path.join(GOLDEN, "vk_ecc_chip.rdata")).read()
    m = re.search(r"fixed_commitments: \[(.*?)\n    \]", text, re.S)
    pts = re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))
    return [(int(x, 16), int(y, 16)) for x, y in pts]


def host_commit(params, col):
    """Unblinded commit_lagrange on host ints (DEFAULT blind = 1 => +w).
    keygen commits fixed columns with Blind::default() == ONE."""
    acc = None
    spec = params.curve
    for v, gpt in zip(col, params.g_lagrange):
        if v:
            acc = spec.add(acc, spec.mul(gpt, v))
    acc = spec.add(acc, params.w)  # blind = 1
    return acc


def main():
    params = Params.new(VESTA, K)
    cols = our_columns()
    np.save("/tmp/ecc_fixed_cols.npy",
            np.array([[str(v) for v in c] for c in cols], dtype=object),
            allow_pickle=True)
    gold = golden_commitments()
    print(f"{len(cols)} our cols, {len(gold)} golden commitments")
    mismatches = []
    for i, col in enumerate(cols):
        ours = host_commit(params, col)
        ok = ours == gold[i]
        nz = [j for j, v in enumerate(col) if v]
        rng = (nz[0], nz[-1], len(nz)) if nz else None
        print(f"col {i:2d}: {'MATCH' if ok else 'DIFF '}  nonzero={rng}")
        if not ok:
            mismatches.append(i)

    # global row-shift hypothesis on first mismatching lagrange column
    for ci in mismatches[:2]:
        col = cols[ci]
        for d in range(-10, 11):
            if d == 0:
                continue
            shifted = [0] * N
            for j, v in enumerate(col):
                if v and 0 <= j + d < N:
                    shifted[j + d] = v
            if host_commit(params, shifted) == gold[ci]:
                print(f"col {ci}: MATCHES with global shift {d:+d}")
                break
        else:
            print(f"col {ci}: no global shift in [-10,10] matches")


if __name__ == "__main__":
    main()
