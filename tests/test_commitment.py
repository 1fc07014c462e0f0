"""IPA commitment + multiopen roundtrip tests
(oracles: commitment.rs:258-379, multiopen.rs:278-481)."""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.transcript import TranscriptWrite, TranscriptRead
from halo2_tpu.poly import (Params, ProverQuery, VerifierQuery,
                            multiopen_create_proof, multiopen_verify_proof,
                            ipa_create_proof, ipa_verify_proof,
                            eval_poly, kate_division)

K = 3
RNG = random.Random(99)


@pytest.fixture(scope="module")
def params():
    return Params.new(PALLAS, K, use_cache=False)


def rand_poly(params, n=None):
    fs = params.curve.scalar
    vals = [RNG.randrange(fs.modulus) for _ in range(n or params.n)]
    return vals, jnp.asarray(params.scalar_df.to_mont_np(vals))


def host_eval(fs, coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % fs.modulus
    return acc


def test_params_serialization_roundtrip(params):
    data = params.write()
    p2 = Params.read(PALLAS, data)
    assert p2.g == params.g and p2.g_lagrange == params.g_lagrange
    assert p2.w == params.w and p2.u == params.u


def test_params_read_rejects_malformed(params):
    import pytest
    data = params.write()
    with pytest.raises(ValueError, match="truncated"):
        Params.read(PALLAS, data[:-1])
    with pytest.raises(ValueError, match="out of range"):
        # absurd k header must be rejected before `1 << k` allocates
        Params.read(PALLAS, b"\xff\xff\xff\xff" + data[4:])


def test_commit_coeff_vs_lagrange(params):
    """commit(z) == commit_lagrange(evals of z) (commitment.rs:258-302)."""
    from halo2_tpu.poly.domain import EvaluationDomain
    dom = EvaluationDomain(params.scalar_df, 3, K)
    vals, dpoly = rand_poly(params)
    lag = dom.coeff_to_lagrange(dpoly)
    c1 = params.commit(dpoly, 5)
    c2 = params.commit_lagrange(lag, 5)
    assert c1 == c2


def test_kate_division_device(params):
    df = params.scalar_df
    fs = params.curve.scalar
    vals, dpoly = rand_poly(params)
    b = RNG.randrange(1, fs.modulus)
    q = kate_division(df, dpoly, df.scalar(b))
    got = [int(x) for x in df.from_mont_np(np.asarray(q))]
    # host synthetic division (length-preserving: top coefficient is 0)
    want = [0] * params.n
    carry = 0
    for i in range(params.n - 1, 0, -1):
        carry = (vals[i] + carry * b) % fs.modulus
        want[i - 1] = carry
    assert got == want


def test_ipa_open_verify(params):
    fs = params.curve.scalar
    df = params.scalar_df
    vals, dpoly = rand_poly(params)
    blind = fs.rand(RNG)
    commitment = params.commit(dpoly, blind)
    x3 = fs.rand(RNG)
    v = host_eval(fs, vals, x3)

    tw = TranscriptWrite(PALLAS)
    tw.write_point(commitment)
    tw.write_scalar(v)
    ipa_create_proof(params, RNG, tw, dpoly, blind, x3)
    proof = tw.finalize()

    tr = TranscriptRead(PALLAS, proof)
    c_read = tr.read_point()
    v_read = tr.read_scalar()
    msm = params.empty_msm()
    msm.append_term(1, c_read)
    guard = ipa_verify_proof(params, msm, tr, x3, v_read)
    # exit 1: expand challenges
    assert guard.use_challenges().eval()

    # exit 2: claimed G (recursion accumulator path)
    tr2 = TranscriptRead(PALLAS, proof)
    tr2.read_point(); tr2.read_scalar()
    msm2 = params.empty_msm()
    msm2.append_term(1, c_read)
    guard2 = ipa_verify_proof(params, msm2, tr2, x3, v_read)
    g = guard2.compute_g()
    msm_final, acc = guard2.use_g(g)
    assert msm_final.eval()
    assert acc.g == g


def test_ipa_wrong_value_fails(params):
    fs = params.curve.scalar
    vals, dpoly = rand_poly(params)
    blind = fs.rand(RNG)
    commitment = params.commit(dpoly, blind)
    x3 = fs.rand(RNG)
    v_wrong = (host_eval(fs, vals, x3) + 1) % fs.modulus

    tw = TranscriptWrite(PALLAS)
    tw.write_point(commitment)
    tw.write_scalar(v_wrong)
    ipa_create_proof(params, RNG, tw, dpoly, blind, x3)
    proof = tw.finalize()

    tr = TranscriptRead(PALLAS, proof)
    c_read = tr.read_point()
    v_read = tr.read_scalar()
    msm = params.empty_msm()
    msm.append_term(1, c_read)
    guard = ipa_verify_proof(params, msm, tr, x3, v_read)
    assert not guard.use_challenges().eval()


def test_multiopen_roundtrip(params):
    fs = params.curve.scalar
    avals, a = rand_poly(params)
    bvals, b = rand_poly(params)
    blind_a, blind_b = fs.rand(RNG), fs.rand(RNG)
    ca = params.commit(a, blind_a)
    cb = params.commit(b, blind_b)
    x = fs.rand(RNG)
    y = fs.rand(RNG)
    # a opened at {x, y}, b opened at {x}
    ax, ay = host_eval(fs, avals, x), host_eval(fs, avals, y)
    bx = host_eval(fs, bvals, x)

    tw = TranscriptWrite(PALLAS)
    queries = [
        ProverQuery(point=x, poly=a, blind=blind_a),
        ProverQuery(point=y, poly=a, blind=blind_a),
        ProverQuery(point=x, poly=b, blind=blind_b),
    ]
    multiopen_create_proof(params, RNG, tw, queries)
    proof = tw.finalize()

    tr = TranscriptRead(PALLAS, proof)
    vqueries = [
        VerifierQuery(point=x, commitment=ca, eval=ax),
        VerifierQuery(point=y, commitment=ca, eval=ay),
        VerifierQuery(point=x, commitment=cb, eval=bx),
    ]
    guard = multiopen_verify_proof(params, tr, vqueries, params.empty_msm())
    assert guard.use_challenges().eval()

    # soundness: wrong eval must fail (multiopen.rs:390-481)
    tr2 = TranscriptRead(PALLAS, proof)
    vbad = [
        VerifierQuery(point=x, commitment=ca, eval=(ax + 1) % fs.modulus),
        VerifierQuery(point=y, commitment=ca, eval=ay),
        VerifierQuery(point=x, commitment=cb, eval=bx),
    ]
    guard2 = multiopen_verify_proof(params, tr2, vbad, params.empty_msm())
    assert not guard2.use_challenges().eval()
