"""Wider shift hypothesis search using saved columns from ecc_fixed_diff."""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from test_ecc_parity import GOLDEN
from halo2_tpu.curves import VESTA
from halo2_tpu.poly import Params

K = 11
N = 1 << K

cols = [[int(v) for v in c]
        for c in np.load("/tmp/ecc_fixed_cols.npy", allow_pickle=True)]
text = open(os.path.join(GOLDEN, "vk_ecc_chip.rdata")).read()
m = re.search(r"fixed_commitments: \[(.*?)\n    \]", text, re.S)
gold = [(int(x, 16), int(y, 16)) for x, y in
        re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))]

params = Params.new(VESTA, K)
spec = params.curve

# Precompute [v]G_i terms per nonzero row once; shifting = re-keying.
def terms(col):
    return {j: spec.mul(params.g_lagrange[0], 0) if False else None
            for j in []}


def commit_from_points(pts):
    acc = None
    for p in pts:
        acc = spec.add(acc, p)
    return spec.add(acc, params.w)


def commit_shifted(col, d):
    acc = None
    for j, v in enumerate(col):
        if v and 0 <= j + d < N:
            acc = spec.add(acc, spec.mul(params.g_lagrange[j + d], v))
    return spec.add(acc, params.w)


for ci in (1, 17, 11):
    col = cols[ci]
    hit = None
    for d in range(-64, 65):
        if commit_shifted(col, d) == gold[ci]:
            hit = d
            break
    print(f"col {ci}: shift match = {hit}", flush=True)
