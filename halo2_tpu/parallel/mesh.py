"""Device-mesh parallel layer: sharded MSM and distributed NTT.

TPU-native replacement for the reference's rayon runtime
(halo2_proofs/src/multicore.rs + arithmetic.rs:345-362 `parallelize`):
work is sharded over a 1-D `jax.sharding.Mesh` ("shard" axis) and the
reduction idioms (`TheBestReduce` for the MSM, fork-join FFT halving)
become XLA collectives:

  - MSM: points/scalars sharded along n; each shard runs the full
    sort+segmented-scan Pippenger locally; per-shard partial results are
    combined with an all_gather + log-depth group-add (the group-add
    "psum" — field addition is exact so any reduction order is
    bit-identical, SURVEY.md §5.8).
  - NTT: four-step algorithm — all_to_all transpose, local size-D DFT over
    the gathered axis, twiddle scaling, all_to_all, local size-(n/D) NTT,
    final all_to_all to restore contiguous natural-order sharding. The
    transposes are the sequence-parallel exchanges of SURVEY.md §5.7.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fields.device import DeviceField, NLIMBS, fmul
from ..curves.device import DeviceCurve, JPoint, padd, tree_sum
from ..ops.ntt import NttPlan, make_plan, ntt
from ..ops.msm import msm

AXIS = "shard"

# Every sharded entry point memoizes its jitted shard_map program here:
# a bare shard_map call re-traces AND re-compiles on every invocation
# (measured 280+ s per prover phase on the 8-device CPU mesh); keyed on
# (kind, mesh, static params), with jax.jit's own cache handling shape
# polymorphism underneath.
_JIT_CACHE: dict = {}


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


# ---------------------------------------------------------------------------
# Sharded MSM
# ---------------------------------------------------------------------------

def _msm_body(cv: DeviceCurve, mesh: Mesh, is_mont: bool,
              assume_affine: bool = False):
    key = ("msm", id(cv), id(mesh), is_mont, assume_affine)
    fn = _JIT_CACHE.get(key)
    if fn is not None:
        return fn

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), JPoint(P(AXIS), P(AXIS), P(AXIS))),
        out_specs=JPoint(P(), P(), P()),
        check_vma=False,
    )
    def body(scalars, local_pts):
        from ..fields.device import from_mont
        digits = (from_mont(cv.scalar, scalars) if is_mont else scalars)
        partial = msm(cv, digits, local_pts,            # local Pippenger
                      assume_affine=assume_affine)
        # group-add reduction across shards: gather partials, tree-add
        stack = JPoint(
            jax.lax.all_gather(partial.x, AXIS),
            jax.lax.all_gather(partial.y, AXIS),
            jax.lax.all_gather(partial.z, AXIS))
        total = tree_sum(cv, stack, axis=0)
        return JPoint(total.x[None], total.y[None], total.z[None])

    fn = jax.jit(body)
    _JIT_CACHE[key] = fn
    return fn


def sharded_msm(cv: DeviceCurve, mesh: Mesh, scalar_digits16: jnp.ndarray,
                pts: JPoint) -> JPoint:
    """MSM with points/scalars sharded along n. Returns the (replicated)
    total as a single JPoint."""
    out = _msm_body(cv, mesh, is_mont=False)(scalar_digits16, pts)
    return JPoint(out.x[0], out.y[0], out.z[0])


# ---------------------------------------------------------------------------
# Distributed four-step NTT
# ---------------------------------------------------------------------------

class ShardedNttPlan:
    """Precomputed tables for a four-step NTT of size n over D shards."""

    def __init__(self, df: DeviceField, n: int, omega: int, ndev: int):
        assert n % (ndev * ndev) == 0, \
            "four-step NTT needs D^2 | n; use the single-device path"
        p = df.spec.modulus
        self.df = df
        self.n = n
        self.ndev = ndev
        self.C = n // ndev
        # size-D DFT root: omega^C ; size-C NTT root: omega^D
        self.plan_rows = make_plan(df, ndev, pow(omega, self.C, p))
        self.plan_cols = make_plan(df, self.C, pow(omega, ndev, p))
        # twiddles w[c, k_r] = omega^(c*k_r) are built lazily per device
        # block by twiddle_block() (host int pows are cheap at D rows)
        self.omega = omega

    def twiddle_block(self, d: int) -> np.ndarray:
        """Montgomery [D, C/D, 16] twiddle block for device d:
        tw[k_r, cl] = omega^((d*C/D + cl) * k_r)."""
        df, p = self.df, self.df.spec.modulus
        D, C = self.ndev, self.C
        CL = C // D
        vals = [[pow(self.omega, (d * CL + cl) * k_r, p)
                 for cl in range(CL)] for k_r in range(D)]
        return np.asarray(df.to_mont_np(vals)).reshape(D, CL, NLIMBS)


def sharded_ntt(df: DeviceField, mesh: Mesh, plan: ShardedNttPlan,
                x: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT of a contiguously-sharded [n, 16] array; output is the
    natural-order result, contiguously sharded."""
    key = ("ntt", id(plan), id(mesh))
    cached = _JIT_CACHE.get(key)
    if cached is not None:
        return cached[0](x, cached[1])
    D = plan.ndev
    C = plan.C
    CL = C // D
    tw_all = getattr(plan, "_tw_all", None)
    if tw_all is None:
        tw_all = jnp.asarray(np.stack([plan.twiddle_block(d)
                                       for d in range(D)]))
        plan._tw_all = tw_all  # [D, D, CL, 16]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    )
    def body(block, tw):
        # block: [C, 16] = row r of the [D, C] view (r = device index)
        # Step 1: all_to_all so each device holds all rows for its column
        # chunk: a[r, cl] with c = d*CL + cl
        b = block.reshape(D, CL, NLIMBS)          # split c into D chunks
        a = jax.lax.all_to_all(b, AXIS, split_axis=0, concat_axis=0,
                               tiled=False)
        # a: [D(rows r), CL, 16] for this device's column chunk
        # Step 2: size-D DFT over r per column: vectorize via reshape
        # ntt() works on [n,16]; vmap over CL
        dft = jax.vmap(lambda col: ntt(df, col, plan.plan_rows),
                       in_axes=1, out_axes=1)(a)   # [D(k_r), CL, 16]
        # Step 3: twiddle omega^(c * k_r)
        t = fmul(df, dft, tw[0])
        # Step 4: all_to_all over k_r: device d keeps k_r = d, all c.
        # tiled=False semantics: the split axis is REMOVED from each piece
        # and a new source-indexed axis is inserted at concat_axis, so the
        # result is [CL(cl), D(source s), 16] — source s held columns
        # c = s*CL + cl, so natural-c order is the transpose.
        back = jax.lax.all_to_all(t, AXIS, split_axis=0, concat_axis=1,
                                  tiled=False)
        row = jnp.swapaxes(back, 0, 1).reshape(C, NLIMBS)
        # Step 5: local size-C NTT with root omega^D
        X = ntt(df, row, plan.plan_cols)           # X[k_c] = out[d + D k_c]
        # Step 6: redistribute to contiguous natural order:
        # global index k = d + D*k_c; device d currently holds all k_c.
        # target: device t holds k in [t*C, (t+1)*C).
        # k_c = (k - d)/D ; for target t, the k_c values with
        # d + D*k_c in [tC, tC+C) are k_c in [ (tC - d + D - 1)//D ...]:
        # since C % D == 0, k_c in [t*C/D, (t+1)*C/D) ... check:
        # k = d + D*k_c in [tC, (t+1)C)  <=>  k_c in [ (tC-d)/D, ... ) and
        # with d < D <= C, floor boundaries land exactly at multiples of
        # C/D. Send chunk t = X[t*CL:(t+1)*CL].
        Xs = X.reshape(D, CL, NLIMBS)
        fin = jax.lax.all_to_all(Xs, AXIS, split_axis=0, concat_axis=0,
                                 tiled=False)
        # fin: [D(source s), CL, 16] on device t: entry [s, j] =
        # X_s[t*CL + j] = out[s + D*(t*CL + j)].
        # local k within block t: k_local = k - t*C = s + D*j
        # → rearrange [s, j] -> flat index s + D*j = transpose to [j, s]
        fin = jnp.swapaxes(fin, 0, 1).reshape(C, NLIMBS)
        return fin

    # tw_all sharded on first axis so each device gets its own block
    fn = jax.jit(body)
    _JIT_CACHE[key] = (fn, tw_all)
    return fn(x, tw_all)


# ---------------------------------------------------------------------------
# Sharded scans (grand products) + batched inversion
# ---------------------------------------------------------------------------

def sharded_inclusive_product(df: DeviceField, mesh: Mesh,
                              x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running product of a row-sharded [n, 16] Montgomery
    array: local associative_scan per shard + an exclusive prefix of the
    per-shard totals distributed via all_gather (SURVEY.md §5.7 — the
    cross-shard analogue of permutation/prover.rs:155-161). Field
    multiplication is exact, so the result is bit-identical to the
    single-device scan."""
    key = ("scan_prod", id(df), id(mesh))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
            check_vma=False,
        )
        def body(local):
            from ..fields.device import _scan_hs
            inc = _scan_hs(df, local, 0, False, True)
            totals = jax.lax.all_gather(inc[-1], AXIS)        # [D, 16]
            pref = jax.lax.associative_scan(
                lambda u, v: fmul(df, u, v), totals, axis=0)  # [D] tiny
            idx = jax.lax.axis_index(AXIS)
            one = jnp.broadcast_to(df.scalar(1), (1, NLIMBS))
            excl = jax.lax.cond(
                idx == 0,
                lambda: one,
                lambda: jax.lax.dynamic_slice_in_dim(pref, idx - 1, 1,
                                                     axis=0))
            return fmul(df, inc, jnp.broadcast_to(excl, inc.shape))

        fn = jax.jit(body)
        _JIT_CACHE[key] = fn
    return fn(x)


def sharded_batch_inv(df: DeviceField, mesh: Mesh,
                      x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field inversion of a row-sharded [n, 16] array: each
    shard runs the two-scan batched-inversion trick locally (inverses
    are value-unique, so shard-local grouping gives identical results to
    a global batch inversion; zeros map to zero)."""
    from ..fields.device import batch_inv

    key = ("batch_inv", id(df), id(mesh))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P(AXIS), out_specs=P(AXIS),
            check_vma=False,
        )
        def body(local):
            return batch_inv(df, local, axis=0)

        fn = jax.jit(body)
        _JIT_CACHE[key] = fn
    return fn(x)


def sharded_msm_mont(cv: DeviceCurve, mesh: Mesh, scalars_mont: jnp.ndarray,
                     pts: JPoint) -> JPoint:
    """sharded_msm over Montgomery-form scalars: the mont->canonical
    digit conversion runs inside the shard (elementwise)."""
    # commit bases are SRS shards — affine with coded identity
    out = _msm_body(cv, mesh, is_mont=True,
                    assume_affine=True)(scalars_mont, pts)
    return JPoint(out.x[0], out.y[0], out.z[0])
