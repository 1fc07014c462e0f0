from .primitive import (K, C, HashDomain, CommitDomain, hash_to_point,
                        hash_value, sinsemilla_s, sinsemilla_q)
