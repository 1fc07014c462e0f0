from .chip import EccChip, EccConfig, EccPoint, FixedPointBase
from .gadget import Point, NonIdentityPoint
