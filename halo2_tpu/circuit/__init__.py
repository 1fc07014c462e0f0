from .value import Value, SynthesisError
from .layouter import (Cell, AssignedCell, Region, Table, Layouter,
                       NamespacedLayouter, SingleChipLayouter, RegionShape,
                       Chip, Circuit)
