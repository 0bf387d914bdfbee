"""Randomized on-device SVD: parity with LAPACK/Lanczos oracles."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

import ccfindr_tpu as cf
from ccfindr_tpu.ops import rsvd
from ccfindr_tpu.ops import sparse as sk
from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.vb import Hyper


def _lowrank(n, m, r, seed, noise=0.01):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, r)) @ rng.normal(size=(r, m))
    return a + noise * rng.normal(size=(n, m))


def test_coo_matmuls_match_dense(rng):
    mat = sp.random(30, 45, density=0.25, random_state=2,
                    data_rvs=lambda k: rng.integers(1, 9, k)).tocsr()
    sc = sk.from_scipy(mat, dtype=jnp.float64, chunk=64)
    b = rng.normal(size=(45, 5))
    a = rng.normal(size=(30, 5))
    np.testing.assert_allclose(np.asarray(rsvd.coo_matmul(sc, jnp.asarray(b))),
                               mat @ b, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(rsvd.coo_rmatmul(sc, jnp.asarray(a))),
        mat.T @ a, rtol=1e-12)


def test_randomized_svd_matches_lapack():
    x = _lowrank(80, 120, 5, seed=3)
    u, s, vt = rsvd.randomized_svd(x, 5, n_iter=4, seed=1,
                                   dtype=jnp.float64)
    u0, s0, vt0 = np.linalg.svd(x, full_matrices=False)
    np.testing.assert_allclose(np.asarray(s), s0[:5], rtol=1e-8)
    # subspaces agree (up to sign): |u^T u0| == I
    ov = np.abs(np.asarray(u).T @ u0[:, :5])
    np.testing.assert_allclose(ov, np.eye(5), atol=1e-6)


def test_randomized_svd_sparse_no_densify():
    rng = np.random.default_rng(4)
    mat = sp.random(60, 90, density=0.2, random_state=5,
                    data_rvs=lambda k: rng.integers(1, 20, k)).tocsr()
    sc = sk.from_scipy(mat, dtype=jnp.float64, chunk=256)
    u, s, vt = rsvd.randomized_svd(sc, 4, n_iter=12, seed=2)
    import scipy.sparse.linalg as spla
    u0, s0, vt0 = spla.svds(mat.astype(np.float64), k=4)
    # a flat random spectrum is the hard case for randomized
    # range-finding: power iterations converge the values slowly
    np.testing.assert_allclose(np.sort(np.asarray(s)),
                               np.sort(s0), rtol=2e-3)


def test_vb_init_svd_randomized_matches_exact():
    """svd2 init via the randomized method == exact method (the init
    only consumes |u|, s, |vt| of a well-separated spectrum)."""
    sim = cf.simulate_whx(nrow=40, ncol=60, rank=3, aw=1.0, ah=1.0,
                          seed=9)
    hy = Hyper(aw=1.0, bw=1.0, ah=1.0, bh=1.0)
    a = vb_ops.vb_init_svd(sim["x"], 3, hy, variant="svd2",
                           dtype=jnp.float64, method="exact")
    b = vb_ops.vb_init_svd(sim["x"], 3, hy, variant="svd2",
                           dtype=jnp.float64, method="randomized")
    np.testing.assert_allclose(np.abs(np.asarray(a.ew)),
                               np.abs(np.asarray(b.ew)), atol=5e-3)


def test_vb_factorize_svd2_randomized_smoke():
    sim = cf.simulate_whx(nrow=30, ncol=50, rank=3, seed=11)
    s = cf.SCSet(count=sp.csr_matrix(sim["x"]))
    out = cf.vb_factorize(s, ranks=3, nrun=1, verbose=0, Itmax=300,
                          initializer="svd2", svd_method="randomized",
                          backend="sparse")
    assert np.isfinite(out.measure["lml"]).all()
