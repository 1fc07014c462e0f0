from .host import FP, FQ, FieldSpec, batch_invert
from .device import (DeviceField, FP_DEV, FQ_DEV, NLIMBS, LIMB_BITS,
                     fadd, fsub, fmul, fsquare, fneg, fpow, finv, batch_inv,
                     feq, is_zero, fselect, to_mont, from_mont,
                     int_to_limbs, limbs_to_int)
