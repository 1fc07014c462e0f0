from .mock_prover import MockProver, POISON
from .cost import CircuitCost, CircuitGates, ProofSize
from .failure import (FailureLocation, CellNotAssigned,
                      ConstraintNotSatisfied, ConstraintPoisoned,
                      LookupFailure, PermutationFailure)
