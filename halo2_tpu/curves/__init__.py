from .host import CurveSpec, PALLAS, VESTA, Point
from .device import (DeviceCurve, JPoint, PALLAS_DEV, VESTA_DEV,
                     padd, pdouble, pneg, pselect, batch_scalar_mul,
                     normalize, tree_sum)
