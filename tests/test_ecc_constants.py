"""Fixed-base window table constants (ecc/chip/constants.rs analogue:
its test_lagrange_coeffs / test_zs_and_us)."""
import random

import pytest

from halo2_tpu.curves import PALLAS
from halo2_tpu.fields import FP, FQ
from halo2_tpu.gadgets.ecc.constants import (
    H, NUM_WINDOWS, NUM_WINDOWS_SHORT, compute_window_table,
    compute_lagrange_coeffs, find_zs_and_us)

RNG = random.Random(99)


def test_window_table_decomposition_roundtrip():
    """Windowed decomposition with the (k+2) offset and final-window
    correction reconstructs [scalar]B (constants.rs:165-210 rationale)."""
    base = PALLAS.mul(PALLAS.generator, 31337)
    nw = 4  # small: emulate a 12-bit scalar
    table = compute_window_table(PALLAS, base, nw)
    q = FQ.modulus
    for _ in range(5):
        scalar = RNG.getrandbits(3 * nw)
        ks = [(scalar >> (3 * w)) & 7 for w in range(nw)]
        acc = None
        for w in range(nw - 1):
            acc = table[w][ks[w]] if acc is None else \
                PALLAS.add(acc, table[w][ks[w]])
        acc = PALLAS.add(acc, table[nw - 1][ks[nw - 1]])
        assert acc == PALLAS.mul(base, scalar)


def test_lagrange_coeffs_interpolate_window_x():
    base = PALLAS.generator
    nw = 3
    coeffs = compute_lagrange_coeffs(PALLAS, base, nw)
    table = compute_window_table(PALLAS, base, nw)
    p = FP.modulus
    for w in range(nw):
        for k in range(H):
            x = 0
            for c in reversed(coeffs[w]):
                x = (x * k + c) % p
            assert x == table[w][k][0]


def test_zs_and_us_properties():
    base = PALLAS.mul(PALLAS.generator, 7)
    nw = 2
    zs_us = find_zs_and_us(PALLAS, base, nw)
    table = compute_window_table(PALLAS, base, nw)
    p = FP.modulus
    for (z, us), window in zip(zs_us, table):
        for u, (x, y) in zip(us, window):
            assert u * u % p == (z + y) % p
            assert not FP.is_square((z - y) % p)


def test_num_windows_constants():
    assert NUM_WINDOWS == 85 and NUM_WINDOWS_SHORT == 22 and H == 8
