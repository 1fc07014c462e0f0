"""Generate per-gadget design docs from the chips' OWN constraint systems.

The reference book ships per-gadget design pages with the constraint
tables the chips implement (book/src/design/gadgets/{ecc,sinsemilla,
sha256}.md); this repo's chips encode the same tables in code. This
script EXTRACTS them (CircuitGates.collect — no hand transcription) and
writes docs/design/{ecc,sinsemilla,table16,pow5}.md, each headed by a
prose summary of the chip's layout and linking the reference page the
table must match.

Run from the repo root:  python scripts/gen_design_docs.py
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

HEADERS = {
    "ecc": """# ECC chip — constraint system

Witnessed short-Weierstrass arithmetic over the Pallas curve: complete
addition, incomplete addition, fixed-base scalar multiplication (full
width, short signed, base-field element) and variable-base scalar
multiplication. Layout and gate set must match
`/root/reference/book/src/design/gadgets/ecc.md` and
`/root/reference/halo2_gadgets/src/ecc/chip/*.rs`; parity is pinned by
the stored vk/proof artifacts (tests/test_gadget_vk_parity.py) and the
vk-text match of tests/test_ecc_parity.py.

The table below is EXTRACTED from this repo's chip configuration
(`halo2_tpu/gadgets/ecc/chip.py`) by `scripts/gen_design_docs.py` —
regenerate after any gate change.
""",
    "sinsemilla": """# Sinsemilla chip — constraint system

Sinsemilla hash via 10-bit lookup-based message-piece decomposition,
with the MerkleCRH layer configuration. Must match
`/root/reference/book/src/design/gadgets/sinsemilla.md` and
`/root/reference/halo2_gadgets/src/sinsemilla/chip/*.rs`; parity pinned
by stored artifacts (tests/test_sinsemilla_parity.py,
tests/test_merkle_parity.py).

Extracted from `halo2_tpu/gadgets/sinsemilla/chip.py` by
`scripts/gen_design_docs.py`.
""",
    "table16": """# SHA-256 Table16 chip — constraint system

SHA-256 compression over 16-bit spread-table lookups: message schedule,
round function (Σ/σ/Ch/Maj via spread arithmetic), and digest assembly.
Must match `/root/reference/book/src/design/gadgets/sha256/table16.md`
and `/root/reference/halo2_gadgets/src/sha256/table16/*.rs`; parity
pinned by the k=17 prove/verify tests (tests/test_sha256.py,
tests/test_table16.py).

Extracted from `halo2_tpu/gadgets/sha256/table16.py` by
`scripts/gen_design_docs.py`.
""",
    "decomposition": """# Decomposition utilities — constraint system

Running-sum decomposition (z_i = (z_{i-1} - k_i)/2^K window recurrence)
and the 10-bit lookup range check with its short-range tail. Must match
`/root/reference/book/src/design/gadgets/decomposition.md` and
`/root/reference/halo2_gadgets/src/utilities/{decompose_running_sum,
lookup_range_check}.rs`; parity pinned by the stored
`vk_{short,lookup}_range_check*.rdata` artifacts
(tests/test_gadget_vk_parity.py).

Extracted from `halo2_tpu/gadgets/utilities/` by
`scripts/gen_design_docs.py`.
""",
    "pow5": """# Poseidon Pow5 chip — constraint system

Poseidon permutation (x^5 S-box) with width-W state in W advice
columns, full/partial round gates and padded sponge. Must match
`/root/reference/halo2_gadgets/src/poseidon/pow5.rs` (design notes in
the book's Poseidon section); parity pinned by
tests/test_gadget_vk_parity.py and the primitive vectors of
tests/test_poseidon.py.

Extracted from `halo2_tpu/gadgets/poseidon/pow5.py` by
`scripts/gen_design_docs.py`.
""",
}


def _section(title: str, circuit_cls) -> tuple[str, int]:
    from halo2_tpu.dev.cost import CircuitGates
    g = CircuitGates.collect(circuit_cls)
    out = [f"## Gates ({title})\n"]
    for gname, cons in g.gates:
        out.append(f"### {gname}\n")
        for cname, expr, qs in cons:
            t = f"**{cname}**: " if cname else ""
            out.append(f"- {t}`{expr}`")
        out.append("")
    out.append(f"Totals: {len(g.gates)} gates, "
               f"{sum(len(c) for _g, c in g.gates)} constraint "
               f"polynomials, {g.total_negations} negations, "
               f"{g.total_additions} additions, "
               f"{g.total_multiplications} multiplications.\n")
    return "\n".join(out), len(g.gates)


def write_doc(name: str, sections) -> None:
    out = [HEADERS[name]]
    total = 0
    for title, circuit_cls in sections:
        text, ngates = _section(title, circuit_cls)
        out.append(text)
        total += ngates
    path = os.path.join(REPO, "docs", "design", f"{name}.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}: {total} gates")


def main() -> None:
    from test_ecc_chip import EccCircuit
    from test_sinsemilla import SinsemillaCircuit
    from test_merkle_parity import MerkleCircuit
    from test_table16 import Sha256Circuit
    from test_pow5_chip import HashCircuit
    write_doc("ecc", [("EccCircuit test configuration", EccCircuit)])
    write_doc("sinsemilla",
              [("SinsemillaCircuit hash configuration",
                SinsemillaCircuit),
               ("MerkleCRH layer configuration", MerkleCircuit)])
    write_doc("table16", [("Sha256Circuit", Sha256Circuit)])
    write_doc("pow5", [("Poseidon HashCircuit", HashCircuit)])
    from test_utilities_gadgets import RangeCheckCircuit, RunningSumCircuit
    write_doc("decomposition",
              [("LookupRangeCheck configuration", RangeCheckCircuit),
               ("Running-sum decomposition", RunningSumCircuit)])


if __name__ == "__main__":
    main()
