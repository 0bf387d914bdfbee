"""Native C++ MatrixMarket parser tests (vs Python fallback)."""

import numpy as np
import scipy.sparse as sp

import ccfindr_tpu as cf
from ccfindr_tpu.native import get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "native mmio failed to build"


def test_native_read_matches_pbmc(pbmc_dir):
    mat = cf.read_mtx(pbmc_dir + "/matrix.mtx")
    assert mat.shape == (1030, 450)
    assert mat.nnz == 91200
    assert mat.sum() > 0
    # spot-check first entries of the raw file
    assert mat[5, 0] == 2
    assert mat[19, 0] == 2
    assert mat[22, 0] == 1


def test_native_roundtrip(tmp_path, rng):
    x = sp.random(60, 45, density=0.2, random_state=3,
                  data_rvs=lambda k: rng.integers(1, 50, k)).tocsr()
    path = str(tmp_path / "m.mtx")
    cf.write_mtx(path, x)
    y = cf.read_mtx(path)
    np.testing.assert_allclose(y.toarray(), x.toarray())


def test_real_field_roundtrip(tmp_path):
    x = sp.csr_matrix(np.array([[0.5, 0], [0, 2.25]]))
    path = str(tmp_path / "r.mtx")
    cf.write_mtx(path, x)
    y = cf.read_mtx(path)
    np.testing.assert_allclose(y.toarray(), x.toarray())
