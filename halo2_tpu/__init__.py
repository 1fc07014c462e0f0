"""halo2_tpu — a TPU-native Halo2-class PLONKish proving system.

Built from scratch in JAX/XLA/Pallas with the capabilities of zcash/halo2
(PLONKish arithmetization, IPA polynomial commitment, permutation and lookup
arguments, recursive accumulation, gadget library, dev tooling), re-designed
for TPU: 255-bit Pasta field arithmetic as 16-bit-limb vector kernels, MSM
and NTT as sharded device programs over a jax Mesh, and the quotient
polynomial evaluated as one fused XLA computation.
"""

__version__ = "0.1.0"
