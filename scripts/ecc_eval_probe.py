"""Localize the ECC-chip fixed-assignment divergence using the golden
proof's fixed evals.

The stored vk text gives the reference's fixed/permutation commitments,
so we can construct the reference's exact transcript_repr, replay
proof_ecc_chip.bin to the challenge x, and read the reference's claimed
fixed-poly evals f_i(x). Comparing with OUR columns' evals at the same x
turns commitment mismatches into value equations:

  d = ours(x) - ref(x) = sum_j delta_j * L_j(x)

which we probe with (a) single-row hypotheses delta = v*L_j (v small)
and (b) suffix-shift hypotheses: rows >= B moved by s, searched jointly
over all mismatching columns via suffix sums.
"""
import os
import re
import sys
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
from halo2_tpu.plonk.compress_selectors import compress_selectors
from halo2_tpu.plonk.assigned import batch_evaluate_assigned
from halo2_tpu.circuit import synthesize_circuit
from halo2_tpu.transcript import TranscriptRead
from halo2_tpu.plonk.keys import VerifyingKey

K = 11
N = 1 << K
P = VESTA.scalar.modulus  # circuit field (= Pallas base field)


def parse_golden():
    text = open(os.path.join(GOLDEN, "vk_ecc_chip.rdata")).read()
    m = re.search(r"fixed_commitments: \[(.*?)\n    \]", text, re.S)
    fixed = [(int(x, 16), int(y, 16)) for x, y in
             re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))]
    m = re.search(r"permutation: VerifyingKey \{\s*commitments: \[(.*?)\n"
                  r"        \]", text, re.S)
    perm = [(int(x, 16), int(y, 16)) for x, y in
            re.findall(r"\(0x([0-9a-f]+), 0x([0-9a-f]+)\)", m.group(1))]
    return text, fixed, perm


def build():
    cs = ConstraintSystem()
    circuit = EccMirrorCircuit(False)
    config = type(circuit).configure(cs)
    params = SimpleNamespace(n=N, k=K)
    assembly = Assembly(cs, params, FP)
    synthesize_circuit(assembly, circuit, config, cs.constants)
    cs2, selector_polys = compress_selectors(cs, assembly.selectors)
    cols = [batch_evaluate_assigned(FP, col) for col in assembly.fixed]
    for poly in selector_polys:
        cols.append([int(x) for x in poly])
    return cs2, cols, assembly


def main():
    golden_text, gold_fixed, gold_perm = parse_golden()
    cs2, cols, assembly = build()

    # fake domain good enough for pinned rendering + rotations
    j = cs2.degree()
    extended_k = K
    while (1 << extended_k) < N * (j - 1):
        extended_k += 1
    omega = pow(VESTA.scalar.root_of_unity, 1 << (VESTA.scalar.s - K), P)
    dom = SimpleNamespace(pinned=lambda: {
        "k": K, "extended_k": extended_k, "omega": omega})
    vk = VerifyingKey(VESTA, dom, gold_fixed, gold_perm, cs2, j)
    ours_text = vk.pinned_text() + "\n"
    if ours_text != golden_text:
        print("pinned text with golden commitments does NOT match:")
        a, b = ours_text.splitlines(), golden_text.splitlines()
        shown = 0
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                print(f"  line {i+1}: ours={x[:120]!r} golden={y[:120]!r}")
                shown += 1
                if shown > 5:
                    break
        sys.exit(1)
    print("pinned text with golden commitments matches -> replaying proof")

    proof = open(os.path.join(GOLDEN, "proof_ecc_chip.bin"), "rb").read()
    tr = TranscriptRead(VESTA, proof)
    vk.hash_into(tr)
    # schedule (no instances, 1 proof): advice comms, theta, lookup
    # permuted pairs, beta, gamma, perm z comms, lookup product comms,
    # random comm, y, h comms, x, then evals
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
    ref_evals = tr.read_n_scalars(len(cs2.fixed_queries))
    tr.read_scalar()  # random_eval
    ref_sigma_evals = tr.read_n_scalars(len(cs2.permutation.columns))
    print(f"x = {x:#x}")

    # Lagrange basis at z for needed rotations
    def lagr_at(z):
        xn = pow(z, N, P)
        # L_j(z) = omega^j (z^N - 1) / (N (z - omega^j))
        ws, w = [], 1
        for _ in range(N):
            ws.append(w)
            w = w * omega % P
        dens = [(z - wj) % P for wj in ws]
        # batch invert
        pref = [1] * (N + 1)
        for i, d in enumerate(dens):
            pref[i + 1] = pref[i] * d % P
        inv = pow(pref[N], P - 2, P)
        invs = [0] * N
        for i in range(N - 1, -1, -1):
            invs[i] = inv * pref[i] % P
            inv = inv * dens[i] % P
        c = (xn - 1) * pow(N, P - 2, P) % P
        return [c * ws[j_] % P * invs[j_] % P for j_ in range(N)]

    lag_cache = {}
    mism = []
    for qi, (column, at) in enumerate(cs2.fixed_queries):
        rot = at.value
        z = x * pow(omega, rot % (P - 1), P) % P if rot >= 0 else \
            x * pow(pow(omega, P - 2, P), -rot, P) % P
        if rot not in lag_cache:
            lag_cache[rot] = lagr_at(z)
        L = lag_cache[rot]
        col = cols[column.index]
        ours = 0
        for jj, v in enumerate(col):
            if v:
                ours = (ours + v * L[jj]) % P
        ok = ours == ref_evals[qi]
        print(f"query {qi}: col {column.index} rot {rot}: "
              f"{'MATCH' if ok else 'DIFF'}")
        if not ok:
            mism.append((qi, column.index, rot, ours, col, L))

    # σ-poly comparison: our copy structure vs the proof's claimed
    # sigma evals (layout-sensitive, fixed-value-insensitive)
    pa = assembly.permutation
    delta = FP.delta
    L0 = lag_cache.get(0) or lagr_at(x)
    omega_l = omega
    dpow = [1] * (len(pa.columns) + 1)
    for i in range(len(pa.columns)):
        dpow[i + 1] = dpow[i] * delta % P
    wpow = [1] * N
    for j2 in range(1, N):
        wpow[j2] = wpow[j2 - 1] * omega_l % P
    for i in range(len(pa.columns)):
        e = 0
        for j2 in range(N):
            v = dpow[pa.map_col[i][j2]] * wpow[pa.map_row[i][j2]] % P
            e = (e + v * L0[j2]) % P
        ok = e == ref_sigma_evals[i]
        print(f"sigma {i} ({pa.columns[i]}): "
              f"{'MATCH' if ok else 'DIFF'}")

    # (a) single-row probes
    for qi, ci, rot, ours, col, L in mism:
        d = (ours - ref_evals[qi]) % P
        found = []
        for jj in range(N):
            v = d * pow(L[jj], P - 2, P) % P
            if v < (1 << 70) or P - v < (1 << 70):
                sv = v if v < (1 << 70) else -(P - v)
                found.append((jj, sv))
        if found:
            print(f"col {ci}: single-row hits: {found[:8]}")

    # (b) suffix-shift search: rows >= B shifted by s (our row j holds
    # what reference has at j+s, i.e. ref = shift_s(ours) for j >= B)
    print("suffix-shift search (ref[j+s] = ours[j] for j >= B), "
          "per column:")
    for s in [d for a in range(1, 33) for d in (a, -a)]:
        for qi, ci, rot, ours, col, L in mism:
            target = ref_evals[qi]
            pre = [0] * (N + 1)
            for jj in range(N):
                pre[jj + 1] = (pre[jj] + col[jj] * L[jj]) % P
            suf = [0] * (N + 1)
            for jj in range(N - 1, -1, -1):
                t = col[jj] * L[jj + s] % P if 0 <= jj + s < N else 0
                suf[jj] = (suf[jj + 1] + t) % P
            hits = [B for B in range(N + 1)
                    if (pre[B] + suf[B]) % P == target]
            if hits:
                print(f"  col {ci} s={s:+d}: B in "
                      f"[{hits[0]}..{hits[-1]}] ({len(hits)})")
    best = None
    for s in ():
        # For each column: ref_eval = sum_{j<B} v_j L_j
        #                + sum_{j>=B} v_j L_{j+s}
        # suffix[B] = sum_{j>=B} v_j L_{j+s}; prefix[B] = sum_{j<B} v_j L_j
        ok_Bs = None
        for qi, ci, rot, ours, col, L in mism:
            target = ref_evals[qi]
            pre = [0] * (N + 1)
            for jj in range(N):
                pre[jj + 1] = (pre[jj] + col[jj] * L[jj]) % P
            suf = [0] * (N + 1)
            for jj in range(N - 1, -1, -1):
                t = col[jj] * L[jj + s] % P if 0 <= jj + s < N else 0
                suf[jj] = (suf[jj + 1] + t) % P
            hits = {B for B in range(N + 1)
                    if (pre[B] + suf[B]) % P == target}
            ok_Bs = hits if ok_Bs is None else (ok_Bs & hits)
            if not ok_Bs:
                break
        if ok_Bs:
            print(f"  shift s={s}: boundary B candidates {sorted(ok_Bs)}")
            best = (s, sorted(ok_Bs))
    if best is None:
        print("  no single suffix-shift explains all mismatching columns")


if __name__ == "__main__":
    main()
