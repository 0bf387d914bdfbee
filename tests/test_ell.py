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


def test_ell_layout_rejected_on_mesh():
    import jax

    from ccfindr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    x = rng.poisson(2.0, (12, 16)).astype(np.float64) + 1
    mesh = make_mesh(cells=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="single-device"):
        cf.vb_factorize(x, ranks=[2], nrun=1, Itmax=5, verbose=0,
                        backend="sparse", sparse_layout="ell",
                        mesh=mesh)
