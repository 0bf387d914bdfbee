"""Cell-sharded single-launch sweep (ops/pallas/sol_sharded.py).

The round-5 mesh production path: sol's architecture per shard, with
psums of the swnt partial / ELBO scalars between kernel phases and the
hyper Newton on the scalar core (VERDICT r4 item 2).  Parity targets:
cells=1 is BIT-identical to the single-device sol path (identical
reduction orders); multi-shard agrees at float-reduction tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import ccfindr_tpu as cf
from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.vb import Hyper
from ccfindr_tpu.ops.pallas import sol
from ccfindr_tpu.ops.pallas import sol_sharded as ss
from ccfindr_tpu.ops.pallas.vb_kernels import _round_up

BN, BM = 16, 128


@pytest.fixture(scope="module")
def problem():
    sim = cf.simulate_whx(nrow=24, ncol=512, rank=3, seed=1)
    x = np.asarray(sim["x"], np.float32)
    n, m = x.shape
    key = jax.random.PRNGKey(0)
    hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1.0,) * 4))
    st = vb_ops.vb_init_random(key, n, m, 3, hyper,
                               dtype=jnp.float32)
    return x, st, hyper


def _pad(x, nc):
    n, m = x.shape
    np_ = _round_up(n, BN)
    mp_ = nc * _round_up(-(-m // nc), BM)
    return jnp.pad(jnp.asarray(x), ((0, np_ - n), (0, mp_ - m)))


def test_cells1_bit_parity_with_single_device(problem):
    """A 1-shard 'cells' mesh runs every reduction in the identical
    order as sol_sweep: results must be bit-for-bit equal."""
    x, st, hyper = problem
    xp = _pad(x, 1)
    ref = sol.vb_run_sol(xp, st, hyper, itmax=25, tol=1e-6,
                         bn=BN, bm=BM)
    mesh = cf.make_mesh(runs=8, cells=1)
    sweep = ss.make_sol_sweep_sharded(mesh)
    got = sol.vb_run_sol(xp, st, hyper, itmax=25, tol=1e-6,
                         bn=BN, bm=BM, sweep_fn=sweep)
    assert float(ref.lml) == float(got.lml)
    assert int(ref.n_iter) == int(got.n_iter)
    for f in ("ew", "eh", "lw", "lh", "dw", "dh"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref.state, f)),
            np.asarray(getattr(got.state, f)), err_msg=f)
    for a, b in zip(ref.hyper, got.hyper):
        assert float(a) == float(b)


def test_four_shards_match_single_device(problem):
    """4 cell shards (psum'd partials, per-shard H epilogue on a
    non-divisible live-cell prefix) track the single-device run at
    f32 reduction tolerance over 30 sweeps."""
    x, st, hyper = problem
    xp = _pad(x, 4)
    ref = sol.vb_run_sol(_pad(x, 1), st, hyper, itmax=30, tol=1e-6,
                         bn=BN, bm=BM)
    mesh = cf.make_mesh(runs=2, cells=4)
    xs = jax.device_put(xp, NamedSharding(mesh, P(None, "cells")))
    sweep = ss.make_sol_sweep_sharded(mesh)
    got = sol.vb_run_sol(xs, st, hyper, itmax=30, tol=1e-6,
                         bn=BN, bm=BM, sweep_fn=sweep)
    np.testing.assert_allclose(float(got.lml), float(ref.lml),
                               rtol=1e-5)
    for f in ("ew", "eh", "lw", "lh", "dw", "dh"):
        np.testing.assert_allclose(
            np.asarray(getattr(got.state, f)),
            np.asarray(getattr(ref.state, f)), rtol=2e-4, atol=1e-6,
            err_msg=f)
    for a, b in zip(got.hyper, ref.hyper):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_vmapped_rank_masks_lane_matches_unbatched(problem):
    """The batched rank sweep's shape: vmap over instances with
    per-instance prefix rank masks — each lane equals its unbatched
    run exactly."""
    x, _, hyper = problem
    n, m = x.shape
    key = jax.random.PRNGKey(3)
    rmax = 4
    st4 = vb_ops.vb_init_random(key, n, m, rmax, hyper,
                                dtype=jnp.float32)
    mesh = cf.make_mesh(runs=2, cells=4)
    xp = _pad(x, 4)
    xs = jax.device_put(xp, NamedSharding(mesh, P(None, "cells")))
    sweep = ss.make_sol_sweep_sharded(mesh)
    rmask = jnp.asarray([[1., 1., 1., 0.], [1., 1., 1., 1.]],
                        jnp.float32)
    rtrue = jnp.asarray([3., 4.], jnp.float32)
    sts = jax.tree.map(lambda a: jnp.stack([a, a]), st4)
    outb = jax.vmap(lambda s, rm, rt: sol.vb_run_sol(
        xs, s, hyper, itmax=20, tol=1e-6, bn=BN, bm=BM,
        rank_mask=rm, r_true=rt, sweep_fn=sweep),
        in_axes=(0, 0, 0))(sts, rmask, rtrue)
    for lane in range(2):
        single = sol.vb_run_sol(
            xs, st4, hyper, itmax=20, tol=1e-6, bn=BN, bm=BM,
            rank_mask=rmask[lane], r_true=rtrue[lane], sweep_fn=sweep)
        assert float(single.lml) == float(outb.lml[lane]), lane
        np.testing.assert_array_equal(
            np.asarray(outb.state.ew[lane]),
            np.asarray(single.state.ew))


def test_driver_mesh_elbo_every_and_bf16():
    """elbo_every and precision='bf16' now reach the cell-sharded
    mesh path (VERDICT r4 item 5): conservative stopping, evidences
    tracking the per-sweep run."""
    sim = cf.simulate_whx(nrow=20, ncol=33, rank=3, seed=44)
    s = cf.SCSet(count=sim["x"])
    mesh = cf.make_mesh(runs=2, cells=4)
    kw = dict(ranks=[2, 3], nrun=2, verbose=0, Itmax=300, seed=9,
              backend="pallas", mesh=mesh)
    a = cf.vb_factorize(s, **kw)
    b = cf.vb_factorize(s, elbo_every=5, **kw)
    np.testing.assert_allclose(a.measure["lml"], b.measure["lml"],
                               rtol=1e-3)
    c = cf.vb_factorize(s, precision="bf16", elbo_every=5, **kw)
    assert np.isfinite(c.measure["lml"]).all()
    np.testing.assert_allclose(c.measure["lml"], a.measure["lml"],
                               rtol=0.05)
