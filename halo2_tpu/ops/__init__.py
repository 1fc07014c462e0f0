from .ntt import NttPlan, make_plan, make_inv_plan, ntt, intt, group_ntt
from .msm import msm, msm_mont, scalar_window_digits
