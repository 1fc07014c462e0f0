from .primitive import (Spec, P128Pow5T3, Grain, generate_constants,
                        generate_mds, permute, Sponge, ConstantLength,
                        poseidon_hash)
from .pow5 import Pow5Chip, Pow5Config, poseidon_hash_gadget
from .gadget import Sponge, Hash, PaddedWord
