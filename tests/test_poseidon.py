"""Poseidon primitive: constants generation and permutation must be
bit-exact with the reference (halo2_poseidon fp.rs/fq.rs hardcoded
constants + p128pow5t3.rs:153-255 sage vectors)."""
from halo2_tpu.fields import FP, FQ
from halo2_tpu.gadgets.poseidon.primitive import (P128Pow5T3,
                                                  generate_constants,
                                                  permute, poseidon_hash)

S = P128Pow5T3()


def test_fp_constants_match_reference():
    rc, mds, mds_inv = generate_constants(FP, S)
    # fp.rs ROUND_CONSTANTS[0][0] and [63][2] (from_raw little-endian limbs)
    assert rc[0][0] == int(
        "0x360d7470611e473d353f628f76d110f3"
        "4e71162f31003b7057538c2596426303", 16)
    assert rc[63][2] == int(
        "0x3a8a628295121d5c5c1e3e9e27a571c3"
        "a004abe8e01528c41211b9e2190d6852", 16)
    # fp.rs MDS[0][0]
    assert mds[0][0] == int(
        "0x0ab5e5b874a68de7b3d59fbdc8c9ead4"
        "97d7a0ab23850b56323f2486d7e11b63", 16)
    # inverse property
    p = FP.modulus
    ident = [[sum(mds[i][k] * mds_inv[k][j] for k in range(3)) % p
              for j in range(3)] for i in range(3)]
    assert ident == [[1, 0, 0], [0, 1, 0], [0, 0, 1]]


def test_fp_permute_vector():
    """sage poseidonperm_x5_pallas_3 vector (p128pow5t3.rs:159-204)."""
    rc, mds, _ = generate_constants(FP, S)
    out = permute(FP, S, [0, 1, 2], mds, rc)
    assert out == [
        0x2a526acd0b64b45394efb364f966240ff7e69a71d0b642a0aeb1bc024aeca456,
        0x13c5d1568b4aa43076ff7dae343d5512dcd42e7fbed9dafe012a3e9628e5b82a,
        0x0a49c868c6976544256fcd597984561af7cfdfe1bda42c7b359029a1d34e9ddd,
    ]


def test_fq_permute_vector():
    """sage poseidonperm_x5_vesta_3 vector (p128pow5t3.rs:206-254)."""
    rc, mds, _ = generate_constants(FQ, S)
    out = permute(FQ, S, [0, 1, 2], mds, rc)
    assert out == [
        0x315a1f4cdb942f7ceddd74f22f8f2ff74d43d1973dd336c60eb08ea813bebe59,
        0x3be475f2d7642bde642adee0dd13aa48413ee0eb7bbd2198f9f126e61ea165f1,
        0x25ab8aece9537168117fdb2420d8ea605019bfd4e0423fa014d542372a7ba0d9,
    ]


def test_hash_constant_length():
    """ConstantLength<2> hash runs and is deterministic; sponge/domain
    semantics per lib.rs:389-465."""
    h1 = poseidon_hash(FP, S, [7, 11])
    h2 = poseidon_hash(FP, S, [7, 11])
    h3 = poseidon_hash(FP, S, [7, 12])
    assert h1 == h2 != h3
    assert 0 < h1 < FP.modulus
