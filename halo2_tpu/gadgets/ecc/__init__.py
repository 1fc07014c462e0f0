from .chip import EccChip, EccConfig, EccPoint
from .gadget import Point, NonIdentityPoint
