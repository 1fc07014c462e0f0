from .chip import EccChip, EccConfig, EccPoint
