"""Device lookup permuted-pair vs the numpy oracle.

The device formulation (plonk/lookup.py::_permute_pair_device_fn) must
produce bit-identical permuted columns to the numpy dense-rank pipeline
(the direct port of lookup/prover.rs:563-647) for any contained input —
including adversarial duplicate patterns."""
import random

import numpy as np
import pytest

from halo2_tpu.curves import VESTA
from halo2_tpu.poly import Params
import halo2_tpu.plonk.lookup as lookup_mod


class _FakeCS:
    def __init__(self, bf):
        self._bf = bf

    def blinding_factors(self):
        return self._bf


@pytest.mark.parametrize("pattern", ["random", "all_equal", "few_distinct"])
def test_permute_pair_device_matches_numpy(monkeypatch, pattern):
    k = 6
    params = Params.new(VESTA, k)
    df = params.scalar_df
    fs = VESTA.scalar
    n = params.n
    bf = 5
    usable = n - (bf + 1)
    rng = random.Random(17)

    if pattern == "random":
        table_vals = [rng.randrange(fs.modulus) for _ in range(usable)]
        input_vals = [table_vals[rng.randrange(usable)]
                      for _ in range(usable)]
    elif pattern == "all_equal":
        v = rng.randrange(fs.modulus)
        table_vals = [v] * usable
        input_vals = [v] * usable
    else:  # few_distinct
        base = [rng.randrange(fs.modulus) for _ in range(4)]
        table_vals = [base[i % 4] for i in range(usable)]
        input_vals = [base[rng.randrange(4)] for _ in range(usable)]

    # full columns incl. the blinding tail the prover never reads
    inp = df.to_mont_np(input_vals + [0] * (bf + 1))
    tab = df.to_mont_np(table_vals + [0] * (bf + 1))
    import jax.numpy as jnp
    inp_d = jnp.asarray(inp)
    tab_d = jnp.asarray(tab)
    cs = _FakeCS(bf)

    monkeypatch.setenv("HALO2_TPU_DEVICE_LOOKUP_SORT", "0")
    pi_np, pt_np = lookup_mod.permute_expression_pair(
        cs, params, random.Random(99), inp_d, tab_d)

    monkeypatch.setenv("HALO2_TPU_DEVICE_LOOKUP_SORT", "1")
    pi_dev, pt_dev = lookup_mod.permute_expression_pair(
        cs, params, random.Random(99), inp_d, tab_d)

    assert np.array_equal(np.asarray(pi_np), np.asarray(pi_dev))
    assert np.array_equal(np.asarray(pt_np), np.asarray(pt_dev))


def test_permute_pair_device_rejects_missing(monkeypatch):
    k = 5
    params = Params.new(VESTA, k)
    df = params.scalar_df
    fs = VESTA.scalar
    n = params.n
    bf = 5
    usable = n - (bf + 1)
    rng = random.Random(3)
    table_vals = [rng.randrange(fs.modulus) for _ in range(usable)]
    input_vals = list(table_vals)
    input_vals[7] = (table_vals[7] + 1) % fs.modulus  # not in table

    import jax.numpy as jnp
    inp_d = jnp.asarray(df.to_mont_np(input_vals + [0] * (bf + 1)))
    tab_d = jnp.asarray(df.to_mont_np(table_vals + [0] * (bf + 1)))

    monkeypatch.setenv("HALO2_TPU_DEVICE_LOOKUP_SORT", "1")
    with pytest.raises(ValueError, match="not contained in table"):
        lookup_mod.permute_expression_pair(
            _FakeCS(bf), params, random.Random(99), inp_d, tab_d)
