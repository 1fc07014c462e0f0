"""Mesh context: routes the prover's device kernels through the sharded
parallel layer.

The reference's rayon runtime is ambient — every `parallelize` call sees
the global thread pool (halo2_proofs/src/multicore.rs:14-34). The TPU
analogue is this context: activating a ProverMesh makes Params commits,
EvaluationDomain transforms, and the grand-product scans run sharded
over the 1-D device mesh (collectives: all_gather for MSM partials,
all_to_all for NTT transposes, gathered-prefix for scans), with arrays
row-sharded along n.

Field/group arithmetic is exact integer math, so every sharded kernel
produces bit-identical values to the single-device path — transcript
bytes are invariant (asserted by tests/test_mesh_prover.py). Usage:

    with ProverMesh(make_mesh(8)):
        create_proof(params, pk, [circuit], [inst], rng, transcript)
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"

_ACTIVE: "ProverMesh | None" = None


class ProverMesh:
    """Context manager that activates sharded execution on `mesh`."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.ndev = int(mesh.devices.size)
        self._row_sharding = NamedSharding(mesh, P(AXIS))
        self._row2_sharding = NamedSharding(mesh, P(AXIS, None))
        self._prev = None

    # -- activation --
    def __enter__(self):
        global _ACTIVE
        self._prev = _ACTIVE
        _ACTIVE = self
        return self

    def __exit__(self, *exc):
        global _ACTIVE
        _ACTIVE = self._prev
        return False

    # -- helpers --
    def divides(self, n: int) -> bool:
        """Sharded kernels need D^2 | n (four-step NTT) and D | n."""
        d = self.ndev
        return n % (d * d) == 0

    def shard_rows(self, arr):
        """Row-shard an [n, ...] device array along the mesh (no-op when
        n is not divisible; resharding an already-sharded array is a
        cheap layout annotation)."""
        if arr.ndim >= 1 and arr.shape[0] % self.ndev == 0:
            sh = (self._row_sharding if arr.ndim == 1
                  else self._row2_sharding)
            return jax.device_put(arr, sh)
        return arr


def active() -> "ProverMesh | None":
    return _ACTIVE


def shard_rows(arr):
    """Module-level convenience: row-shard under the active mesh."""
    ctx = _ACTIVE
    return arr if ctx is None else ctx.shard_rows(arr)
