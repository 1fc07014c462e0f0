"""halo2_tpu — a TPU-native Halo2-class PLONKish proving system.

Built from scratch in JAX/XLA/Pallas with the capabilities of zcash/halo2
(PLONKish arithmetization, IPA polynomial commitment, permutation and lookup
arguments, recursive accumulation, gadget library, dev tooling), re-designed
for TPU: 255-bit Pasta field arithmetic as 16-bit-limb vector kernels, MSM
and NTT as sharded device programs over a jax Mesh, and the quotient
polynomial evaluated as one fused XLA computation.
"""

__version__ = "0.1.0"

_LAZY = {
    # proving system
    "keygen_vk": "halo2_tpu.plonk", "keygen_pk": "halo2_tpu.plonk",
    "create_proof": "halo2_tpu.plonk", "verify_proof": "halo2_tpu.plonk",
    "SingleVerifier": "halo2_tpu.plonk",
    "AccumulatorStrategy": "halo2_tpu.plonk",
    "BatchVerifier": "halo2_tpu.plonk",
    "ConstraintSystem": "halo2_tpu.plonk",
    # commitment scheme
    "Params": "halo2_tpu.poly",
    # circuit API
    "Circuit": "halo2_tpu.circuit", "Value": "halo2_tpu.circuit",
    # transcript
    "TranscriptRead": "halo2_tpu.transcript",
    "TranscriptWrite": "halo2_tpu.transcript",
    # curves
    "PALLAS": "halo2_tpu.curves", "VESTA": "halo2_tpu.curves",
    # dev
    "MockProver": "halo2_tpu.dev", "CircuitCost": "halo2_tpu.dev",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(name)
