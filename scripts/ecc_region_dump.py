"""Dump the ECC mirror circuit's region layout (index, start row, name)
under the SimpleFloorPlanner — host-only, for comparison against the
reference's assign code."""
import os
import sys
from types import SimpleNamespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from test_ecc_parity import EccMirrorCircuit

from halo2_tpu.fields import FQ
from halo2_tpu.plonk.circuit import ConstraintSystem
from halo2_tpu.plonk.keygen import Assembly
from halo2_tpu.circuit.layouter import SingleChipLayouter
from halo2_tpu.circuit import synthesize_circuit


def main():
    k = 11
    cs = ConstraintSystem()
    circuit = EccMirrorCircuit(False)
    config = type(circuit).configure(cs)
    params = SimpleNamespace(n=1 << k, k=k)
    assembly = Assembly(cs, params, FQ)

    rows = []
    orig = SingleChipLayouter.assign_region
    from halo2_tpu.circuit.layouter import RegionShape, Region

    def traced(self, name, assignment):
        idx = len(self.regions)
        shape = RegionShape(idx)
        assignment(Region(shape))
        out = orig(self, name, assignment)
        cols = sorted(str(c) for c in shape.columns)
        rows.append((idx, name, self.regions[idx], shape.row_count, cols))
        return out

    SingleChipLayouter.assign_region = traced
    try:
        synthesize_circuit(assembly, circuit, config, cs.constants)
    finally:
        SingleChipLayouter.assign_region = orig

    for idx, name, start, height, cols in rows:
        print(f"{idx:4d}  start={start:6d} h={height:3d}  {name:50s} {','.join(cols)}")


if __name__ == "__main__":
    main()
