"""Search for the ECC-chip layout divergence via placement mutations.

Logs every region's shape/height/fixed-cells/selector-enables from one
instrumented synthesis, then replays SimpleFloorPlanner placement under
single mutations (height deltas, shape column add/drop, in-region offset
shifts) of each region TYPE, rebuilding the fixed + compressed-selector
columns and comparing their evals at the golden proof's challenge x with
the reference's claimed evals (see ecc_eval_probe.py). A mutation that
matches all queried columns IS the reference's layout.
"""
import json
import os
import re
import sys
from collections import defaultdict
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from test_ecc_parity import EccMirrorCircuit, GOLDEN

from halo2_tpu.fields import FP
from halo2_tpu.curves import VESTA
from halo2_tpu.plonk.circuit import ConstraintSystem
from halo2_tpu.plonk.keygen import Assembly
from halo2_tpu.plonk.compress_selectors import (SelectorDescription, process)
from halo2_tpu.plonk.assigned import batch_evaluate_assigned
from halo2_tpu.circuit import synthesize_circuit
from halo2_tpu.circuit import layouter as lay
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.plonk.keys import VerifyingKey

K = 11
N = 1 << K
P = VESTA.scalar.modulus
CACHE = "/tmp/ecc_ref_evals.json"


def ref_evals_and_x(cs2):
    """Replay golden proof to x and the reference fixed evals, keyed by
    (col_index, rot). Cached to CACHE."""
    if os.path.exists(CACHE):
        d = json.load(open(CACHE))
        return int(d["x"]), {tuple(map(int, k.split(","))): int(v)
                             for k, v in d["evals"].items()}
    text = open(os.path.join(GOLDEN, "vk_ecc_chip.rdata")).read()
    m = re.search(r"fixed_commitments: \[(.*?)\n    \]", text, re.S)
    gold_fixed = [(int(x, 16), int(y, 16)) for x, y in
                  re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)",
                             m.group(1))]
    m = re.search(r"permutation: VerifyingKey \{\s*commitments: \[(.*?)\n"
                  r"        \]", text, re.S)
    gold_perm = [(int(x, 16), int(y, 16)) for x, y in
                 re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)",
                            m.group(1))]
    j = cs2.degree()
    extended_k = K
    while (1 << extended_k) < N * (j - 1):
        extended_k += 1
    omega = pow(VESTA.scalar.root_of_unity, 1 << (VESTA.scalar.s - K), P)
    dom = SimpleNamespace(pinned=lambda: {
        "k": K, "extended_k": extended_k, "omega": omega})
    vk = VerifyingKey(VESTA, dom, gold_fixed, gold_perm, cs2, j)
    assert vk.pinned_text() + "\n" == text, "CS no longer matches golden"
    proof = open(os.path.join(GOLDEN, "proof_ecc_chip.bin"), "rb").read()
    tr = TranscriptRead(VESTA, proof)
    vk.hash_into(tr)
    tr.read_n_points(cs2.num_advice_columns)
    tr.squeeze_challenge()
    for _ in cs2.lookups:
        tr.read_point(), tr.read_point()
    tr.squeeze_challenge()
    tr.squeeze_challenge()
    chunk = j - 2
    num_sets = (len(cs2.permutation.columns) + chunk - 1) // chunk
    tr.read_n_points(num_sets)
    for _ in cs2.lookups:
        tr.read_point()
    tr.read_point()
    tr.squeeze_challenge()
    tr.read_n_points(j - 1)
    x = tr.squeeze_challenge()
    tr.read_n_scalars(len(cs2.instance_queries))
    tr.read_n_scalars(len(cs2.advice_queries))
    evals = tr.read_n_scalars(len(cs2.fixed_queries))
    out = {}
    for qi, (column, at) in enumerate(cs2.fixed_queries):
        out[(column.index, at.value)] = evals[qi]
    json.dump({"x": str(x),
               "evals": {f"{c},{r}": str(v) for (c, r), v in out.items()}},
              open(CACHE, "w"))
    return x, out


TRACE = []
CURRENT = [None]


_ORIG_ASSIGN_REGION = lay.SingleChipLayouter.assign_region


def _traced_assign_region(self, name, assignment):
    shape = lay.RegionShape(len(self.regions))
    assignment(lay.Region(shape))
    rec = {"name": str(name), "cols": list(shape.columns),
           "h": shape.row_count, "fixed": [], "sels": [],
           "start": None}
    TRACE.append(rec)
    CURRENT[0] = rec
    out = _ORIG_ASSIGN_REGION(self, name, assignment)
    CURRENT[0] = None
    rec["start"] = self.regions[-1]
    return out


def instrument(assembly):
    orig_fixed = assembly.assign_fixed
    orig_sel = assembly.enable_selector

    def assign_fixed(annotation, column, row, to):
        out = orig_fixed(annotation, column, row, to)
        if CURRENT[0] is not None:
            v = assembly.fixed[column.index][row]
            CURRENT[0]["fixed"].append((column.index, row, v))
        return out

    def enable_selector(annotation, selector, row):
        out = orig_sel(annotation, selector, row)
        if CURRENT[0] is not None:
            CURRENT[0]["sels"].append((selector.index, row))
        return out

    assembly.assign_fixed = assign_fixed
    assembly.enable_selector = enable_selector


def synthesize_traced():
    cs = ConstraintSystem()
    circuit = EccMirrorCircuit(False)
    config = type(circuit).configure(cs)
    params = SimpleNamespace(n=N, k=K)
    assembly = Assembly(cs, params, FP)
    instrument(assembly)
    lay.SingleChipLayouter.assign_region = _traced_assign_region
    try:
        synthesize_circuit(assembly, circuit, config, cs.constants)
    finally:
        lay.SingleChipLayouter.assign_region = _ORIG_ASSIGN_REGION
    # convert absolute rows to region offsets; evaluate Assigned values
    for rec in TRACE:
        s = rec["start"]
        fx = []
        for ci, row, v in rec["fixed"]:
            iv = batch_evaluate_assigned(FP, [v])[0]
            fx.append((ci, row - s, iv))
        rec["fixed"] = fx
        rec["sels"] = [(si, row - s) for si, row in rec["sels"]]
    return cs, assembly


def col_key(c):
    return repr(c)


def place(trace, mut):
    """Replay placement; mut mutates (cols, h) per region via type name.
    Returns list of starts."""
    first_free = defaultdict(int)
    starts = []
    for rec in trace:
        cols = rec["cols"]
        h = rec["h"]
        if mut is not None:
            cols, h = mut(rec, cols, h)
        keys = [col_key(c) for c in cols]
        start = max((first_free[k] for k in keys), default=0)
        starts.append(start)
        for k in keys:
            first_free[k] = start + h
    return starts


def evals_for(trace, starts, offmut, L, degrees, num_sel, max_degree,
              fixed_indices):
    """Rebuild fixed + compressed cols under given starts, return
    {col_index: eval}."""
    fixed_cols = {ci: defaultdict(int) for ci in fixed_indices}
    acts = [[False] * N for _ in range(num_sel)]
    for ri, rec in enumerate(trace):
        s = starts[ri]
        for ci, off, v in rec["fixed"]:
            if ci in fixed_cols and v:
                doff = offmut(rec, "fixed", ci, off) if offmut else off
                fixed_cols[ci][s + doff] = v
        for si, off in rec["sels"]:
            doff = offmut(rec, "sel", si, off) if offmut else off
            acts[si][s + doff] = True
    from halo2_tpu.plonk.circuit import FixedQuery, Rotation
    dummy = lambda: FixedQuery(query_index=0, column_index=0,
                               rotation=Rotation(0))
    polys, _ = process(
        [SelectorDescription(selector=i, activations=a,
                             max_degree=degrees[i])
         for i, a in enumerate(acts)],
        max_degree, dummy)
    out = {}
    for ci, cells in fixed_cols.items():
        e = 0
        for r, v in cells.items():
            e = (e + v * L[r]) % P
        out[ci] = e
    base = max(fixed_indices) + 1
    for k2, poly in enumerate(polys):
        e = 0
        for r, v in enumerate(poly):
            if v:
                e = (e + v * L[r]) % P
        out[base + k2] = e
    return out


def main():
    cs, assembly = synthesize_traced()
    for _i, _rec in enumerate(TRACE):
        _rec['idx'] = _i
    import copy
    from halo2_tpu.plonk.compress_selectors import compress_selectors
    cs2 = cs  # compress mutates; compute degrees first
    degrees = [0] * cs.num_selectors
    for gate in cs.gates:
        for poly in gate.polys:
            sel = poly.extract_simple_selector()
            if sel is not None:
                degrees[sel.index] = max(degrees[sel.index], poly.degree())
    max_degree = cs.degree()
    num_sel = cs.num_selectors
    sels_snapshot = [list(a) for a in assembly.selectors]
    cs2, _polys = compress_selectors(cs, assembly.selectors)
    x, refs = ref_evals_and_x(cs2)

    # Lagrange basis at x (all ECC fixed queries are rotation 0)
    omega = pow(VESTA.scalar.root_of_unity, 1 << (VESTA.scalar.s - K), P)
    xn = pow(x, N, P)
    ws, w = [], 1
    for _ in range(N):
        ws.append(w)
        w = w * omega % P
    dens = [(x - wj) % P for wj in ws]
    pref = [1] * (N + 1)
    for i, d in enumerate(dens):
        pref[i + 1] = pref[i] * d % P
    inv = pow(pref[N], P - 2, P)
    invs = [0] * N
    for i in range(N - 1, -1, -1):
        invs[i] = inv * pref[i] % P
        inv = inv * dens[i] % P
    cnst = (xn - 1) * pow(N, P - 2, P) % P
    L = [cnst * ws[j_] % P * invs[j_] % P for j_ in range(N)]

    fixed_indices = sorted({ci for rec in TRACE for ci, _, _ in rec["fixed"]
                            if ci not in (0, 9)})
    ref_by_col = {c: v for (c, r), v in refs.items() if r == 0}
    target_cols = sorted(c for c in ref_by_col if c not in (0, 9))

    def score(starts, offmut=None):
        ev = evals_for(TRACE, starts, offmut, L, degrees, num_sel,
                       max_degree, fixed_indices)
        return sum(1 for c in target_cols if ev.get(c) == ref_by_col[c])

    base_starts = place(TRACE, None)
    mismatch_place = [i for i, rec in enumerate(TRACE)
                      if rec["start"] != base_starts[i]]
    print(f"placement replay sanity: {len(mismatch_place)} diffs "
          f"{mismatch_place[:5]}")
    base_score = score(base_starts)
    print(f"base score {base_score}/{len(target_cols)}")

    types = sorted({rec["name"] for rec in TRACE if rec["h"] > 0})
    results = []

    # 1) height deltas per type
    for t in types:
        for dh in (-3, -2, -1, 1, 2, 3):
            def mut(rec, cols, h, t=t, dh=dh):
                return (cols, max(h + dh, 0)) if rec["name"] == t else \
                    (cols, h)
            s = score(place(TRACE, mut))
            if s > base_score:
                results.append((s, f"height {t!r} {dh:+d}"))

    # 2) drop a shape column per type
    for t in types:
        allcols = {col_key(c) for rec in TRACE if rec["name"] == t
                   for c in rec["cols"]}
        for ck in sorted(allcols):
            def mut(rec, cols, h, t=t, ck=ck):
                if rec["name"] != t:
                    return cols, h
                return [c for c in cols if col_key(c) != ck], h
            s = score(place(TRACE, mut))
            if s > base_score:
                results.append((s, f"drop {t!r} col {ck}"))

    # 3) add a shape column per type (advice 0..9)
    from halo2_tpu.plonk.circuit import Column
    for t in types:
        for ci in range(10):
            extra = Column(ci, "advice")
            def mut(rec, cols, h, t=t, extra=extra):
                if rec["name"] != t:
                    return cols, h
                return list(cols) + [extra], h
            s = score(place(TRACE, mut))
            if s > base_score:
                results.append((s, f"add {t!r} col advice{ci}"))

    # 4) shift all fixed cells or one selector's enables within a type
    for t in types:
        sels_in_t = sorted({si for rec in TRACE if rec["name"] == t
                            for si, _ in rec["sels"]})
        for d in (-1, 1):
            def offmut(rec, kind, idx, off, t=t, d=d):
                if rec["name"] == t and kind == "fixed":
                    return off + d
                return off
            s = score(base_starts, offmut)
            if s > base_score:
                results.append((s, f"fixedshift {t!r} {d:+d}"))
            for si in sels_in_t:
                def offmut2(rec, kind, idx, off, t=t, d=d, si=si):
                    if rec["name"] == t and kind == "sel" and idx == si:
                        return off + d
                    return off
                s = score(base_starts, offmut2)
                if s > base_score:
                    results.append((s, f"selshift {t!r} sel{si} {d:+d}"))

    # 5) pad-top per type: height += d AND all in-region offsets += d
    def padtop_mut(t, d):
        def mut(rec, cols, h):
            return (cols, h + d) if rec["name"] == t else (cols, h)
        def offmut(rec, kind, idx, off):
            return off + d if rec["name"] == t else off
        return mut, offmut

    for t in types:
        for d in (1, 2, 3):
            mut, offmut = padtop_mut(t, d)
            s = score(place(TRACE, mut), offmut)
            if s > base_score:
                results.append((s, f"padtop {t!r} +{d}"))

    # 6) per-instance height / pad-top for regions starting in 820..1010
    inst = [i for i, rec in enumerate(TRACE)
            if rec["start"] is not None and 820 <= rec["start"] <= 1010
            and rec["h"] > 0]
    for i in inst:
        for d in (-2, -1, 1, 2):
            def mut(rec, cols, h, i=i, d=d):
                return (cols, max(h + d, 0)) if rec['idx'] == i \
                    else (cols, h)
            s = score(place(TRACE, mut))
            if s > base_score:
                results.append(
                    (s, f"inst {i} ({TRACE[i]['name']}) height {d:+d}"))
        for d in (1, 2):
            def mut(rec, cols, h, i=i, d=d):
                return (cols, h + d) if rec['idx'] == i else (cols, h)
            def offmut(rec, kind, idx, off, i=i, d=d):
                return off + d if rec['idx'] == i else off
            s = score(place(TRACE, mut), offmut)
            if s > base_score:
                results.append(
                    (s, f"inst {i} ({TRACE[i]['name']}) padtop +{d}"))

    results.sort(reverse=True)
    print(f"{len(results)} improving mutations; top:")
    for s, desc in results[:25]:
        print(f"  {s:3d}/{len(target_cols)}  {desc}")


if __name__ == "__main__":
    main()
