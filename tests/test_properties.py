"""Property tests mirroring the reference's proptest suites (SURVEY §4.2):

- Assigned rational arithmetic vs direct field arithmetic
  (halo2_proofs/src/plonk/assigned.rs proptests);
- multiopen construct_intermediate_sets determinism across point values
  (halo2_proofs/src/poly/multiopen.rs:510-628);
- selector compression correctness: every substituted expression must
  reproduce its selector's activation pattern on the combination column,
  under the gate degree bound
  (halo2_proofs/src/plonk/circuit/compress_selectors.rs proptests).

Randomized with fixed seeds (the proptest-regressions analogue is just a
deterministic seed here).
"""
import random

import pytest

from halo2_tpu.fields import FP, FQ
from halo2_tpu.plonk.assigned import Assigned, batch_evaluate_assigned
from halo2_tpu.plonk.compress_selectors import (SelectorDescription, process)
from halo2_tpu.plonk.circuit import Constant, FixedQuery
from halo2_tpu.poly.multiopen import construct_intermediate_sets
from halo2_tpu.poly.polynomial import Rotation


# ---------------------------------------------------------------------------
# Assigned rationals (assigned.rs proptests: ops agree with field ops,
# with the 0-denominator => 0 convention)
# ---------------------------------------------------------------------------

def _field_ref(op, x, y, p):
    if op == "add":
        return (x + y) % p
    if op == "sub":
        return (x - y) % p
    if op == "mul":
        return x * y % p
    raise AssertionError(op)


@pytest.mark.parametrize("f", [FP, FQ])
def test_assigned_ops_match_field(f):
    rng = random.Random(0xA551)
    p = f.modulus
    for _ in range(200):
        # random rational operands, including zero denominators
        def rand_assigned():
            kind = rng.randrange(4)
            if kind == 0:
                return Assigned.zero(), 0
            if kind == 1:
                v = rng.randrange(p)
                return Assigned.trivial(v), v
            n = rng.randrange(p)
            d = rng.randrange(p) if kind == 2 else 0
            a = Assigned(n, d)
            val = 0 if (d == 0 or n == 0) else n * f.inv(d) % p
            return a, val

        a, av = rand_assigned()
        b, bv = rand_assigned()
        op = rng.choice(["add", "sub", "mul"])
        got = getattr(a, op)(b, f)
        # evaluate via the batch path (the prover's route)
        got_val = batch_evaluate_assigned(f, [got])[0]
        # NB: rational ops with a zero denominator poison the result to 0
        # (reference: Assigned treats x/0 as 0), which the direct field
        # reference must reproduce through the batch-invert convention.
        n1, d1 = a.num_den()
        n2, d2 = b.num_den()
        if d1 != 0 and d2 != 0:
            assert got_val == _field_ref(op, av, bv, p), (op, a, b)
        # negation and inversion round-trips
        assert batch_evaluate_assigned(f, [a.neg(f)])[0] == (-av) % p or \
            d1 == 0
        inv = a.invert()
        inv_val = batch_evaluate_assigned(f, [inv])[0]
        if av != 0 and d1 != 0:
            assert inv_val == f.inv(av)
        # double inversion is identity (for nonzero)
        if av != 0 and d1 != 0:
            assert batch_evaluate_assigned(f, [inv.invert()])[0] == av


@pytest.mark.parametrize("f", [FP])
def test_assigned_batch_matches_single(f):
    rng = random.Random(0xA552)
    p = f.modulus
    vals = []
    for _ in range(64):
        n = rng.randrange(p)
        d = rng.choice([None, 1, rng.randrange(1, p)])
        vals.append(Assigned(n, d))
    batch = batch_evaluate_assigned(f, vals)
    single = [a.evaluate(f) for a in vals]
    assert batch == single


# ---------------------------------------------------------------------------
# multiopen intermediate sets (multiopen.rs:510-628 proptest: the grouping
# is determined by the query STRUCTURE, not the point/eval values)
# ---------------------------------------------------------------------------

def _structure(queries):
    """Run construct_intermediate_sets and extract a value-free shape."""
    out = construct_intermediate_sets(
        queries,
        get_point=lambda q: q[1],
        get_eval=lambda q: q[2],
        get_key=lambda q: q[0],
        track_evals=True,
    )
    assert out is not None
    commitment_data, point_sets = out
    # replace concrete points by their first-appearance index
    order = {}
    for q in queries:
        if q[1] not in order:
            order[q[1]] = len(order)
    shape_sets = [tuple(order[pt] for pt in ps) for ps in point_sets]
    shape_comms = [(cd.commitment[0], cd.set_index)
                   for cd in commitment_data]
    return shape_comms, shape_sets


def test_intermediate_sets_deterministic_across_point_values():
    rng = random.Random(0x1005)
    p = FP.modulus
    for _ in range(50):
        n_comms = rng.randrange(1, 6)
        n_points = rng.randrange(1, 5)
        # structure: which commitment is queried at which point slot
        structure = []
        for c in range(n_comms):
            slots = sorted(rng.sample(range(n_points),
                                      rng.randrange(1, n_points + 1)))
            for s in slots:
                structure.append((c, s))
        rng.shuffle(structure)

        def materialize(points, evals):
            return [((c,), points[s], evals[(c, s)]) for c, s in structure]

        pts_a = list({rng.randrange(1, p) for _ in range(n_points)})
        pts_b = list({rng.randrange(1, p) for _ in range(n_points)})
        while len(pts_a) < n_points:
            pts_a.append(rng.randrange(1, p))
        while len(pts_b) < n_points:
            pts_b.append(rng.randrange(1, p))
        evals_a = {(c, s): rng.randrange(p) for c, s in structure}
        evals_b = {(c, s): rng.randrange(p) for c, s in structure}
        shape_a = _structure(materialize(pts_a, evals_a))
        shape_b = _structure(materialize(pts_b, evals_b))
        assert shape_a == shape_b


def test_intermediate_sets_conflicting_evals_rejected():
    # same commitment+point with two different evals must return None
    queries = [(("c",), 7, 1), (("c",), 7, 2)]
    out = construct_intermediate_sets(
        queries, get_point=lambda q: q[1], get_eval=lambda q: q[2],
        get_key=lambda q: q[0], track_evals=True)
    assert out is None


# ---------------------------------------------------------------------------
# selector compression (compress_selectors.rs proptest)
# ---------------------------------------------------------------------------

def _eval_at(expr, value, p):
    """Evaluate a substitution expression at a combination-column value."""
    return expr.evaluate(
        constant=lambda v: v % p,
        selector_fn=lambda s: (_ for _ in ()).throw(AssertionError()),
        fixed_fn=lambda q: value % p,
        advice_fn=None, instance_fn=None,
        negated=lambda x: (-x) % p,
        sum_fn=lambda a, b: (a + b) % p,
        product=lambda a, b: a * b % p,
        scaled=lambda a, k: a * k % p,
    )


@pytest.mark.parametrize("seed", range(8))
def test_selector_compression_reproduces_activations(seed):
    rng = random.Random(seed)
    p = FP.modulus
    n_rows = rng.randrange(4, 33)
    n_sel = rng.randrange(1, 12)
    max_degree = rng.randrange(3, 8)
    sels = []
    for i in range(n_sel):
        acts = [rng.random() < 0.3 for _ in range(n_rows)]
        deg = rng.randrange(0, max_degree + 1)
        sels.append(SelectorDescription(
            selector=i, activations=acts, max_degree=deg))

    counter = [0]

    def alloc():
        q = FixedQuery(query_index=None, column_index=counter[0],
                       rotation=Rotation(0))
        counter[0] += 1
        return q

    combos, assignments = process(sels, max_degree, alloc)
    assert counter[0] == len(combos)
    assert sorted(a.selector for a in assignments) == list(range(n_sel))
    for a in assignments:
        col = combos[a.combination_index]
        sel = sels[a.selector]
        # degree bound: substituted expression degree + original gate
        # degree contribution stays within max_degree for packed
        # (nonzero-degree) selectors
        if sel.max_degree > 0:
            assert a.expression.degree() + (sel.max_degree - 1) \
                <= max_degree
        for row in range(n_rows):
            # reference semantics (compress_selectors.rs proptest):
            # nonzero exactly on the selector's active rows
            got = _eval_at(a.expression, col[row], p)
            assert (got != 0) == sel.activations[row], (a.selector, row)


def test_selector_compression_exclusive_rows():
    # two mutually-exclusive selectors pack into ONE column; two
    # overlapping ones cannot
    a = SelectorDescription(0, [True, False, True, False], 2)
    b = SelectorDescription(1, [False, True, False, True], 2)
    combos, _ = process([a, b], 5, lambda: Constant(0))
    assert len(combos) == 1
    c = SelectorDescription(1, [True, True, False, False], 2)
    combos, _ = process([a, c], 5, lambda: Constant(0))
    assert len(combos) == 2
