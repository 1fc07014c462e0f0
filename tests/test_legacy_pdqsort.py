"""Rust-1.56.1 pdqsort port (circuit/legacy_pdqsort.py): sorting
correctness across the algorithm's regimes plus the V1 feature wiring."""
import random

import pytest

from halo2_tpu.circuit.legacy_pdqsort import quicksort


def _check(vals):
    got = list(vals)
    quicksort(got, lambda a, b: a < b)
    assert got == sorted(vals)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 19, 20, 21, 49, 50, 51, 127,
                               128, 129, 255, 256, 1000, 4096])
def test_sorts_correctly_across_regimes(n):
    rng = random.Random(n)
    _check([rng.randrange(1 << 30) for _ in range(n)])          # random
    _check(list(range(n)))                                      # sorted
    _check(list(range(n))[::-1])                                # reversed
    _check([rng.randrange(4) for _ in range(n)])                # few keys
    _check([7] * n)                                             # constant
    # organ pipe + sawtooth (pattern-breaking paths)
    _check(list(range(n // 2)) + list(range(n // 2))[::-1])
    _check([i % 10 for i in range(n)])


def test_deterministic():
    rng = random.Random(3)
    vals = [(rng.randrange(16), i) for i in range(5000)]
    a = list(vals)
    quicksort(a, lambda x, y: x[0] < y[0])
    b = list(vals)
    quicksort(b, lambda x, y: x[0] < y[0])
    assert a == b
    assert [x[0] for x in a] == sorted(x[0] for x in vals)


def test_unstable_order_differs_from_stable():
    """Equal keys: the pdqsort order is an artifact of the algorithm
    and (for large-enough inputs) differs from the stable sort — the
    entire reason the reference pins the legacy feature."""
    rng = random.Random(8)
    vals = [(rng.randrange(8), i) for i in range(2000)]
    unstable = list(vals)
    quicksort(unstable, lambda x, y: x[0] < y[0])
    stable = sorted(vals, key=lambda x: x[0])
    assert unstable != stable


def test_v1_legacy_flag_changes_layout(monkeypatch):
    """The env flag must reorder equal-area regions in the V1 planner
    (enough regions that the unstable order actually differs)."""
    from halo2_tpu.circuit.floor_planner_v1 import (
        slot_in_biggest_advice_first)
    from halo2_tpu.circuit.layouter import RegionShape
    from halo2_tpu.plonk.circuit import ConstraintSystem

    cs = ConstraintSystem()
    cols = [cs.advice_column() for _ in range(4)]

    rng = random.Random(5)
    shapes = []
    for i in range(200):
        s = RegionShape(i)
        s.columns = {cols[rng.randrange(4)]}
        s.row_count = rng.randrange(1, 4)
        shapes.append(s)

    starts_stable, _ = slot_in_biggest_advice_first(list(shapes))
    monkeypatch.setenv("HALO2_TPU_LEGACY_PDQSORT", "1")
    starts_legacy, _ = slot_in_biggest_advice_first(list(shapes))
    assert starts_stable != starts_legacy
