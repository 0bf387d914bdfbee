"""Tile-sparse Pallas kernel: differential tests vs dense/COO.

The capacity-path backend (ops/tile.py) expands static-structure slot
blocks into dense VMEM tiles inside a Pallas kernel (interpret mode on
CPU); these tests pin its outputs to the dense fused kernel
(reference math src/vbnmf_update.cpp:33-36) and its driver
integration to the dense backends.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import ccfindr_tpu as cf
from ccfindr_tpu.ops import tile as tk
from ccfindr_tpu.ops import vb as vb_ops


def _problem(n=80, m=120, r=5, density=0.15, seed=0, hot_rows=3):
    """Sparse problem with a few dense 'housekeeping' rows to force
    overflow tails at a low slot quantile."""
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
def test_fused_tile_matches_dense(quantile):
    x, lw, lh = _problem()
    tc = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=quantile)
    if quantile < 1.0:
        assert tc.trow.shape[0] > 0   # tails actually exercised
    swn_t, shn_t, dt_t = tk.fused_tile(tc, lw, lh)
    swn_d, shn_d, dt_d = vb_ops.fused_dense(jnp.asarray(x), lw, lh)
    np.testing.assert_allclose(np.asarray(swn_t), np.asarray(swn_d),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shn_t), np.asarray(shn_d),
                               rtol=1e-10)
    np.testing.assert_allclose(float(dt_t), float(dt_d), rtol=1e-10)


def test_fused_tile_matches_coo():
    # bit-level peer check against the COO fused backend (VERDICT
    # round-3 parity requirement for the sparse kernels)
    from ccfindr_tpu.ops import sparse as sk

    x, lw, lh = _problem(seed=4)
    tc = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=0.8)
    sc = sk.from_scipy(sp.csr_matrix(x), dtype=jnp.float64)
    swn_t, shn_t, dt_t = tk.fused_tile(tc, lw, lh)
    swn_c, shn_c, dt_c = sk.fused_coo(sc, lw, lh)
    np.testing.assert_allclose(np.asarray(swn_t), np.asarray(swn_c),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shn_t), np.asarray(shn_c),
                               rtol=1e-10)
    np.testing.assert_allclose(float(dt_t), float(dt_c), rtol=1e-10)


def test_val_covers_every_nonzero_once():
    x, _, _ = _problem(seed=3)
    tc = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=0.5)
    assert tc.packed   # integer counts < 65536 pack by default
    assert float(jnp.sum(tc.val)) == pytest.approx(x.sum())
    nnz = int((x > 0).sum())
    main = np.asarray(tc.cols) & 0xFFFF
    assert int((main > 0).sum()) == nnz - tc.trow.shape[0]

    # unpacked layout covers the same multiset
    tu = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=0.5, pack=False)
    assert not tu.packed
    assert float(jnp.sum(tu.val)) == pytest.approx(x.sum())


def test_vb_factorize_tile_matches_dense():
    rng = np.random.default_rng(11)
    x = (rng.random((30, 45)) < 0.3) * rng.poisson(4.0, (30, 45))
    x = x.astype(np.float64)
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    kw = dict(ranks=[3], nrun=2, Itmax=60, verbose=0, seed=7,
              dtype=jnp.float64)
    res_d = cf.vb_factorize(x, backend="dense", **kw)
    # sparse_layout='auto' resolves to the tile backend
    res_t = cf.vb_factorize(sp.csr_matrix(x), backend="sparse", **kw)
    np.testing.assert_allclose(
        res_t.measure["lml"].to_numpy(),
        res_d.measure["lml"].to_numpy(), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res_t.basis[0]),
                               np.asarray(res_d.basis[0]), rtol=1e-6)


def test_fused_tile_sharded_matches_single_device():
    import jax

    from ccfindr_tpu.parallel.mesh import make_mesh
    from ccfindr_tpu.parallel.sharded import make_tile_fused_sharded

    x, lw, lh = _problem(n=24, m=64, r=3, seed=5)
    n_sh = 4
    mesh = make_mesh(cells=n_sh, devices=jax.devices()[:n_sh])
    tc_s = tk.from_scipy_tile_sharded(sp.csr_matrix(x), n_sh,
                                      dtype=jnp.float64, quantile=0.5)
    fused = make_tile_fused_sharded(mesh)
    swn_s, shn_s, dt_s = jax.jit(fused)(tc_s, lw, lh)

    tc = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=0.5)
    swn, shn, dt = tk.fused_tile(tc, lw, lh)
    np.testing.assert_allclose(np.asarray(swn_s), np.asarray(swn),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(shn_s), np.asarray(shn),
                               rtol=1e-10)
    np.testing.assert_allclose(float(dt_s), float(dt), rtol=1e-10)


def test_vb_factorize_tile_mesh_matches_single_device():
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
    res_m = cf.vb_factorize(sp.csr_matrix(x), mesh=mesh, **kw)
    res_1 = cf.vb_factorize(sp.csr_matrix(x), **kw)
    np.testing.assert_allclose(
        res_m.measure["lml"].to_numpy(),
        res_1.measure["lml"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(res_m.coeff[0]),
                               np.asarray(res_1.coeff[0]), rtol=1e-7)


# ---------------------------------------------------------------------
# ML phases
# ---------------------------------------------------------------------

def test_tile_ml_phases_match_reference_math():
    x, w, h = _problem(seed=7)
    tc = tk.from_scipy_tile(sp.csr_matrix(x), dtype=jnp.float64,
                            quantile=0.5)
    wh = np.asarray(w) @ np.asarray(h)
    xn = np.asarray(x)
    hn, xlg = tk.tile_ml_h(tc, w, h)
    hn_ref = np.asarray(w).T @ np.where(xn > 0, xn / wh, 0.0)
    xlg_ref = np.sum(np.where(xn > 0, xn * np.log(wh), 0.0))
    np.testing.assert_allclose(np.asarray(hn), hn_ref, rtol=1e-10)
    np.testing.assert_allclose(float(xlg), xlg_ref, rtol=1e-10)
    wn = tk.tile_ml_w(tc, w, h)
    wn_ref = np.where(xn > 0, xn / wh, 0.0) @ np.asarray(h).T
    np.testing.assert_allclose(np.asarray(wn), wn_ref, rtol=1e-10)


def test_factorize_sparse_tile_matches_dense():
    rng = np.random.default_rng(2)
    x = (rng.random((40, 60)) < 0.4) * rng.poisson(3.0, (40, 60))
    x = x.astype(np.float64)
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    kw = dict(ranks=[3], nrun=2, Itmax=100, verbose=0, seed=3,
              dtype=jnp.float64)
    rd = cf.factorize(x, backend="dense_fused", **kw)
    rs = cf.factorize(sp.csr_matrix(x), backend="sparse", **kw)
    np.testing.assert_allclose(
        rs.measure["likelihood"].to_numpy(),
        rd.measure["likelihood"].to_numpy(), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rs.basis[0]),
                               np.asarray(rd.basis[0]), rtol=1e-8)


def test_factorize_sparse_tile_mesh_matches_single_device():
    import jax

    from ccfindr_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    x = (rng.random((40, 60)) < 0.4) * rng.poisson(3.0, (40, 60))
    x = x.astype(np.float64)
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    kw = dict(ranks=[3], nrun=2, Itmax=100, verbose=0, seed=3,
              dtype=jnp.float64, backend="sparse")
    mesh = make_mesh(cells=4, devices=jax.devices()[:4])
    rm = cf.factorize(sp.csr_matrix(x), mesh=mesh, **kw)
    rs = cf.factorize(sp.csr_matrix(x), **kw)
    np.testing.assert_allclose(
        rm.measure["likelihood"].to_numpy(),
        rs.measure["likelihood"].to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rm.basis[0]),
                               np.asarray(rs.basis[0]), rtol=1e-10)


def test_factorize_sparse_randomize():
    """Sparse column shuffle preserves each column's multiset of
    values and produces the randomized measure schema."""
    from ccfindr_tpu.drivers.ml_driver import _shuffle_sparse_columns

    rng = np.random.default_rng(0)
    x = (rng.random((30, 40)) < 0.3) * rng.poisson(3.0, (30, 40))
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    csr = sp.csr_matrix(x.astype(np.float64))
    sh = _shuffle_sparse_columns(csr, np.random.default_rng(1))
    a, b = np.asarray(csr.todense()), np.asarray(sh.todense())
    for j in range(a.shape[1]):
        assert sorted(a[:, j]) == sorted(b[:, j])

    res = cf.factorize(csr, backend="sparse", randomize=True, nsmpl=2,
                       ranks=[2, 3], nrun=2, Itmax=50, verbose=0,
                       seed=1, dtype=jnp.float64)
    assert list(res.measure.columns) == [
        "rank", "likelihood", "r_se", "dispersion", "d_se",
        "cophenetic", "c_se"]


def test_tile_elbo_every_and_bf16(mesh8=None):
    """elbo_every and precision='bf16' on the tile-sparse backend
    (VERDICT r4 item 5): the capacity path gains both opt-in levers,
    single-device and cell-sharded mesh.  Under the cadence the
    recorded lml is the ELBO at the last CHECK sweep (conservative
    stopping, same semantics as the dense sol path), so the oracle is
    the dense pallas run under the SAME cadence."""
    sim = cf.simulate_whx(nrow=24, ncol=40, rank=3, seed=21)
    s = cf.SCSet(count=sim["x"])
    kw = dict(ranks=[2, 3], nrun=2, verbose=0, Itmax=250, seed=5)
    dense5 = cf.vb_factorize(s, backend="pallas", elbo_every=5, **kw)
    tile5 = cf.vb_factorize(s, backend="sparse", elbo_every=5, **kw)
    np.testing.assert_allclose(tile5.measure["lml"].to_numpy(),
                               dense5.measure["lml"].to_numpy(),
                               rtol=1e-4)

    base = cf.vb_factorize(s, backend="sparse", **kw)
    bf = cf.vb_factorize(s, backend="sparse", precision="bf16", **kw)
    assert np.isfinite(bf.measure["lml"]).all()
    np.testing.assert_allclose(bf.measure["lml"].to_numpy(),
                               base.measure["lml"].to_numpy(),
                               rtol=0.05)

    mesh = cf.make_mesh(runs=2, cells=4)
    both = cf.vb_factorize(s, backend="sparse", mesh=mesh,
                           elbo_every=5, precision="bf16", **kw)
    assert np.isfinite(both.measure["lml"]).all()
    np.testing.assert_allclose(both.measure["lml"].to_numpy(),
                               base.measure["lml"].to_numpy(),
                               rtol=0.05)
