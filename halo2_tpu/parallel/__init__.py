from .mesh import (AXIS, make_mesh, sharded_msm, sharded_ntt,
                   ShardedNttPlan)
