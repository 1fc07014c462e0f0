"""Port of the reference's `circuit-layout` example (halo2_proofs/
examples/circuit-layout.rs): render a circuit's region layout, here as
SVG + text (the reference uses plotters PNG)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from halo2_tpu.fields import FQ  # noqa: E402
from halo2_tpu.dev.graph import CircuitLayout, circuit_dot_graph  # noqa


def main():
    from two_chip import MyCircuit
    a, b = 4, 7
    c = (a * a + b * b) % FQ.modulus
    layout = CircuitLayout(5, MyCircuit(a, b), [[c]], fs=FQ)
    print(layout.render_text())
    out = os.path.join(os.path.dirname(__file__), "circuit_layout.svg")
    with open(out, "w") as fh:
        fh.write(layout.render_svg())
    print(f"wrote {out}")
    print(circuit_dot_graph(5, MyCircuit(a, b), [[c]], fs=FQ))


if __name__ == "__main__":
    main()
