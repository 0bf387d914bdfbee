"""ELL gather-only sparse kernel: differential tests vs dense/COO."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import ccfindr_tpu as cf
from ccfindr_tpu.ops import ell as ek
from ccfindr_tpu.ops import vb as vb_ops


def _problem(n=80, m=120, r=5, density=0.15, seed=0, hot_rows=3):
    """Sparse problem with a few dense 'housekeeping' rows to force
    overflow tails at a low ELL quantile."""
    rng = np.random.default_rng(seed)
    x = (rng.random((n, m)) < density) * rng.poisson(3.0, (n, m))
    x = x.astype(np.float64)
    x[:hot_rows] = rng.poisson(2.0, (hot_rows, m))
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    lw = jnp.asarray(rng.gamma(1.0, 1.0, size=(n, r)))
    lh = jnp.asarray(rng.gamma(1.0, 1.0, size=(r, m)))
    return x, lw, lh


@pytest.mark.parametrize("quantile", [1.0, 0.5])
def test_fused_ell_matches_dense(quantile):
    x, lw, lh = _problem()
    ec = ek.from_scipy_ell(sp.csr_matrix(x), dtype=jnp.float64,
                           quantile=quantile, lane=8)
    if quantile < 1.0:
        assert ec.gtval.shape[0] > 0   # tails actually exercised
    swn_e, shn_e, dt_e = ek.fused_ell(ec, lw, lh)
    swn_d, shn_d, dt_d = vb_ops.fused_dense(jnp.asarray(x), lw, lh)
    np.testing.assert_allclose(np.asarray(swn_e), np.asarray(swn_d),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shn_e), np.asarray(shn_d),
                               rtol=1e-10)
    np.testing.assert_allclose(float(dt_e), float(dt_d), rtol=1e-10)


def test_val_covers_every_nonzero_once():
    x, _, _ = _problem(seed=3)
    ec = ek.from_scipy_ell(sp.csr_matrix(x), dtype=jnp.float64,
                           quantile=0.5, lane=8)
    assert float(jnp.sum(ec.val)) == pytest.approx(x.sum())
    nnz = int((x > 0).sum())
    assert int(jnp.sum(ec.gval > 0)) + 0 == nnz - ec.gtval.shape[0]
    # by-cell partition covers the same multiset of values
    cell_total = float(jnp.sum(ec.cval)) + float(jnp.sum(ec.ctval))
    assert cell_total == pytest.approx(x.sum())


def test_vb_factorize_ell_matches_dense():
    rng = np.random.default_rng(11)
    x = (rng.random((30, 45)) < 0.3) * rng.poisson(4.0, (30, 45))
    x = x.astype(np.float64)
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    kw = dict(ranks=[3], nrun=2, Itmax=60, verbose=0, seed=7,
              dtype=jnp.float64)
    res_d = cf.vb_factorize(x, backend="dense", **kw)
    res_e = cf.vb_factorize(sp.csr_matrix(x), backend="sparse",
                            sparse_layout="ell", **kw)
    np.testing.assert_allclose(
        res_e.measure["lml"].to_numpy(),
        res_d.measure["lml"].to_numpy(), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_e.basis[0]),
                               np.asarray(res_d.basis[0]), rtol=1e-6)


def test_fused_ell_sharded_matches_single_device():
    # cell-sharded dual ELL under shard_map == unsharded fused_ell
    import jax

    from ccfindr_tpu.parallel.mesh import make_mesh
    from ccfindr_tpu.parallel.sharded import make_ell_fused_sharded

    x, lw, lh = _problem(n=24, m=64, r=3, seed=5)
    n_sh = 4
    mesh = make_mesh(cells=n_sh, devices=jax.devices()[:n_sh])
    ec_s = ek.from_scipy_ell_sharded(sp.csr_matrix(x), n_sh,
                                     dtype=jnp.float64, lane=8)
    fused = make_ell_fused_sharded(mesh)
    swn_s, shn_s, dt_s = jax.jit(fused)(ec_s, lw, lh)

    ec = ek.from_scipy_ell(sp.csr_matrix(x), dtype=jnp.float64,
                           lane=8)
    swn, shn, dt = ek.fused_ell(ec, lw, lh)
    np.testing.assert_allclose(np.asarray(swn_s), np.asarray(swn),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shn_s), np.asarray(shn),
                               rtol=1e-10)
    np.testing.assert_allclose(float(dt_s), float(dt), rtol=1e-10)


def test_vb_factorize_ell_mesh_matches_single_device():
    import jax

    from ccfindr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    x = (rng.random((20, 30)) < 0.4) * rng.poisson(3.0, (20, 30))
    x = x.astype(np.float64)
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    kw = dict(ranks=[3], nrun=2, Itmax=50, verbose=0, seed=4,
              dtype=jnp.float64, backend="sparse")
    mesh = make_mesh(cells=4, devices=jax.devices()[:4])
    res_m = cf.vb_factorize(sp.csr_matrix(x), mesh=mesh,
                            sparse_layout="ell", **kw)
    res_1 = cf.vb_factorize(sp.csr_matrix(x), sparse_layout="ell",
                            **kw)
    np.testing.assert_allclose(
        res_m.measure["lml"].to_numpy(),
        res_1.measure["lml"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_m.coeff[0]),
                               np.asarray(res_1.coeff[0]), rtol=1e-7)
