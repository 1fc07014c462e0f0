from .value import Value, SynthesisError
from .layouter import (Cell, AssignedCell, Region, Table, Layouter,
                       NamespacedLayouter, SingleChipLayouter, RegionShape,
                       Chip, Circuit)


def synthesize_circuit(cs_assignment, circuit, config, constants):
    """Dispatch on the circuit's floor planner ('simple' | 'v1'), the
    associated-type choice of plonk/circuit.rs:469-471."""
    planner = getattr(type(circuit), "floor_planner", "simple")
    if planner == "v1":
        from .floor_planner_v1 import synthesize_v1
        synthesize_v1(cs_assignment, circuit, config, constants)
    else:
        layouter = SingleChipLayouter(cs_assignment, constants)
        circuit.synthesize(config, layouter)
