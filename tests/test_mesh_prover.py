"""Mesh-sharded prover: full create_proof on the virtual 8-device CPU
mesh must produce byte-identical transcripts to the single-device prover
(the bit-exactness contract of SURVEY.md §5.8: field/group math is exact,
so sharded kernels — all_gather-reduced MSMs, four-step all_to_all NTTs,
cross-shard prefix scans — cannot change the proof)."""
import random

import jax
import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import TranscriptRead, TranscriptWrite
from halo2_tpu.poly import Params
from halo2_tpu.poly.polynomial import Rotation
from halo2_tpu.circuit import Circuit, Value
from halo2_tpu.parallel import ProverMesh, make_mesh
from halo2_tpu.dev.circuits import MulChainCircuit
from halo2_tpu.plonk import (keygen_vk, keygen_pk, create_proof,
                             verify_proof, SingleVerifier)

K = 10  # n = 1024; 8 devices => D^2 = 64 | n and | extended_n
NDEV = 8
FS = PALLAS.scalar


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < NDEV:
        pytest.skip(f"needs {NDEV} virtual devices")
    params = Params.new(PALLAS, K, use_cache=False)
    circuit = MulChainCircuit(5)
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)
    return params, vk, pk, circuit


def _prove(params, pk, circuit, instances, seed=77):
    tw = TranscriptWrite(PALLAS)
    create_proof(params, pk, [circuit], [instances], random.Random(seed),
                 tw)
    return tw.finalize()


def test_mesh_prove_transcript_parity(setup):
    params, vk, pk, circuit = setup
    inst = [[circuit.expected_out()]]

    baseline = _prove(params, pk, circuit, inst)

    with ProverMesh(make_mesh(NDEV)):
        sharded = _prove(params, pk, circuit, inst)

    assert sharded == baseline, \
        "mesh-sharded prover diverged from single-device transcript"
    tr = TranscriptRead(PALLAS, sharded)
    verify_proof(params, vk, SingleVerifier(params), [inst], tr)


def test_mesh_prove_lookup_circuit_parity():
    """Sharded lookup path (permuted-pair z over the mesh) + multi-chunk
    permutation: the plonk_api circuit at k=10, transcript parity."""
    import random as _random
    from halo2_tpu.curves import VESTA
    from tests.test_plonk_api_parity import PlonkApiCircuit
    from halo2_tpu.fields import FP

    if len(jax.devices()) < NDEV:
        pytest.skip(f"needs {NDEV} virtual devices")
    params = Params.new(VESTA, K, use_cache=False)
    a = 2834758237 * FP.zeta % FP.modulus
    instance = 2
    circuit = PlonkApiCircuit(a, [instance, a, a, 0])
    vk = keygen_vk(params, circuit)
    pk = keygen_pk(params, vk, circuit)

    def prove():
        tw = TranscriptWrite(VESTA)
        create_proof(params, pk, [circuit], [[[instance]]],
                     _random.Random(31), tw)
        return tw.finalize()

    baseline = prove()
    with ProverMesh(make_mesh(NDEV)):
        sharded = prove()
    assert sharded == baseline
    tr = TranscriptRead(VESTA, sharded)
    verify_proof(params, vk, SingleVerifier(params), [[[instance]]], tr)


def test_mesh_kernels_match_single_device(setup):
    """Direct kernel-level parity on real prover-sized data: sharded
    NTT/iNTT round-trip and sharded commit vs the plain paths."""
    import numpy as np
    params, vk, pk, circuit = setup
    domain = vk.domain
    df = params.scalar_df
    rng = random.Random(3)
    vals = [rng.randrange(FS.modulus) for _ in range(params.n)]
    x = df.upload_values(vals)

    plain_coeff = np.asarray(domain.lagrange_to_coeff(x))
    plain_ext = np.asarray(domain.coeff_to_extended(
        domain.lagrange_to_coeff(x)))
    plain_commit = params.commit_lagrange(x, 123)

    with ProverMesh(make_mesh(NDEV)):
        mesh_coeff = np.asarray(domain.lagrange_to_coeff(x))
        mesh_ext = np.asarray(domain.coeff_to_extended(
            domain.lagrange_to_coeff(x)))
        mesh_back = np.asarray(domain.extended_to_coeff(
            jax.numpy.asarray(mesh_ext)))
        mesh_commit = params.commit_lagrange(x, 123)

    assert np.array_equal(mesh_coeff, plain_coeff)
    assert np.array_equal(mesh_ext, plain_ext)
    plain_back = np.asarray(domain.extended_to_coeff(
        jax.numpy.asarray(plain_ext)))
    assert np.array_equal(mesh_back, plain_back)
    assert mesh_commit == plain_commit
