"""hash_to_curve (SSWU + 3-isogeny) parity tests.

The isogeny in halo2_tpu.curves.sswu is derived via Velu's formulas with
two normalization pins (kernel cube root selected by pasta's published
iso-A; closing isomorphism u = +1/3).  These tests check the derived map
is byte-identical to pasta_curves' published ISOGENY_CONSTANTS rational
map (pasta_curves src/hashtocurve.rs / curves.rs), not merely isomorphic.
"""
import random

import pytest

from halo2_tpu.fields import FP, FQ
from halo2_tpu.curves import PALLAS, VESTA
from halo2_tpu.curves.sswu import sswu_params, hash_to_curve, ISO_A

# pasta_curves' published ISOGENY_CONSTANTS for iso-Pallas -> Pallas
# (pasta_curves src/curves.rs, Ep::ISOGENY_CONSTANTS).  Mathematically
# self-validating: a wrong set would not map E' onto y^2 = x^3 + 5.
PALLAS_ISOGENY_CONSTANTS = [
    0x0e38e38e38e38e38e38e38e38e38e38e4081775473d8375b775f6034aaaaaaab,
    0x3509afd51872d88e267c7ffa51cf412a0f93b82ee4b994958cf863b02814fb76,
    0x17329b9ec525375398c7d7ac3d98fd13380af066cfeb6d690eb64faef37ea4f7,
    0x1c71c71c71c71c71c71c71c71c71c71c8102eea8e7b06eb6eebec06955555580,
    0x1d572e7ddc099cff5a607fcce0494a799c434ac1c96b6980c47f2ab668bcd71f,
    0x325669becaecd5d11d13bf2a7f22b105b4abf9fb9a1fc81c2aa3af1eae5b6604,
    0x1a12f684bda12f684bda12f684bda12f7642b01ad461bad25ad985b5e38e38e4,
    0x1a84d7ea8c396c47133e3ffd28e7a09507c9dc17725cca4ac67c31d8140a7dbb,
    0x3fb98ff0d2ddcadd303216cce1db9ff11765e924f745937802e2be87d225b234,
    0x025ed097b425ed097b425ed097b425ed0ac03e8e134eb3e493e53ab371c71c4f,
    0x0c02c5bcca0e6b7f0790bfb3506defb65941a3a4a97aa1b35a28279b1d1b42ae,
    0x17033d3c60c68173573b3d7f7d681310d976bbfabbc5661d4d90ab820b12320a,
    0x40000000000000000000000000000000224698fc094cf91b992d30ecfffffde5,
]


def _pasta_iso_map(x, y, c, p):
    """The published degree-3 rational map (hashtocurve.rs iso_map)."""
    nx = (((c[0] * x + c[1]) % p * x + c[2]) % p * x + c[3]) % p
    dx = ((x + c[4]) % p * x + c[5]) % p
    ny = (((c[6] * x + c[7]) % p * x + c[8]) % p * x + c[9]) % p
    dy = (((x + c[10]) % p * x + c[11]) % p * x + c[12]) % p
    return (nx * pow(dx, p - 2, p) % p,
            y * ny % p * pow(dy, p - 2, p) % p)


def _rand_iso_point(s, f, rng):
    p = f.modulus
    while True:
        x = rng.randrange(p)
        rhs = (x * x * x + s.iso_a * x + s.iso_b) % p
        if f.is_square(rhs):
            return x, f.sqrt(rhs)


def test_iso_a_pinned_to_published():
    assert sswu_params("pallas").iso_a == ISO_A["pallas"]
    assert sswu_params("vesta").iso_a == ISO_A["vesta"]
    assert sswu_params("pallas").iso_b == 1265
    assert sswu_params("vesta").iso_b == 1265


def test_published_constants_are_a_real_isogeny():
    """Self-validation of the embedded constants: they map E' onto E."""
    s = sswu_params("pallas")
    p = FP.modulus
    rng = random.Random(42)
    for _ in range(4):
        x, y = _rand_iso_point(s, FP, rng)
        xo, yo = _pasta_iso_map(x, y, PALLAS_ISOGENY_CONSTANTS, p)
        assert (yo * yo - (xo ** 3 + 5)) % p == 0


def test_velu_map_equals_published_map():
    """The Velu-derived map is byte-identical to pasta's rational map."""
    s = sswu_params("pallas")
    p = FP.modulus
    rng = random.Random(7)
    for _ in range(6):
        x, y = _rand_iso_point(s, FP, rng)
        assert s.iso_map((x, y)) == _pasta_iso_map(
            x, y, PALLAS_ISOGENY_CONSTANTS, p)


@pytest.mark.parametrize("curve", [PALLAS, VESTA])
def test_hash_to_curve_on_curve_and_deterministic(curve):
    pts = [hash_to_curve(curve, "Halo2-Parameters", bytes([0, i, 0, 0, 0]))
           for i in range(4)]
    for pt in pts:
        assert curve.is_on_curve(pt)
    assert len({p[0] for p in pts}) == 4
    assert hash_to_curve(curve, "Halo2-Parameters",
                         bytes(5)) == pts[0]


def test_dst_changes_output():
    a = hash_to_curve(PALLAS, "Halo2-Parameters", b"\x01")
    b = hash_to_curve(PALLAS, "Other-Domain", b"\x01")
    assert a != b
