from .polynomial import Rotation, rotate
from .domain import EvaluationDomain
from .utils import (powers, tree_add, eval_poly, inner_product,
                    kate_division, distribute_powers)
from .commitment import (Params, MSMAccumulator, DEFAULT_BLIND,
                         ipa_create_proof, ipa_verify_proof, Guard,
                         Accumulator, compute_b, compute_s)
from .multiopen import (ProverQuery, VerifierQuery, multiopen_create_proof,
                        multiopen_verify_proof, lagrange_interpolate)
