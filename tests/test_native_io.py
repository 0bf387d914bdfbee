"""Native C++ MatrixMarket parser tests (vs Python fallback)."""

import numpy as np
import scipy.sparse as sp

import ccfindr_tpu as cf
from ccfindr_tpu.native import get_lib


def test_native_lib_builds():
    assert get_lib() is not None, "native mmio failed to build"


def test_native_read_matches_bundled(data_dir):
    """Native parser vs scipy's reference parser on the bundled trio."""
    import scipy.io as sio

    path = data_dir + "/matrix.mtx"
    mat = cf.read_mtx(path)
    want = sio.mmread(path).tocsr()
    assert mat.shape == want.shape
    assert mat.nnz == want.nnz
    np.testing.assert_array_equal(mat.toarray(), want.toarray())


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


def test_native_mt_parser_matches(tmp_path):
    """Multi-threaded parser == single-thread parser == scipy, on a
    file large enough to split across threads, with no trailing
    newline."""
    import ctypes
    import scipy.sparse as sp
    from ccfindr_tpu.native import get_lib
    from ccfindr_tpu.io import write_mtx, read_mtx

    lib = get_lib()
    if lib is None or not hasattr(lib, "mtx_parse_mt"):
        import pytest
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(5)
    n, m = 500, 800
    mat = sp.random(n, m, density=0.05, random_state=7,
                    data_rvs=lambda k: rng.integers(1, 99, k)).tocsr()
    path = str(tmp_path / "big.mtx")
    write_mtx(path, mat)
    # strip the trailing newline to exercise the partial-line tail
    with open(path, "rb+") as f:
        f.seek(-1, 2)
        f.truncate()

    got = read_mtx(path)   # routes through mtx_parse_mt
    np.testing.assert_array_equal(got.toarray(), mat.toarray())

    # force the 1 << 20 size threshold branch too: direct mt call
    from ccfindr_tpu.io import _read_mtx_header
    nn, mm, nnz, field, symmetry, nlines = _read_mtx_header(path)
    rows = np.empty(nnz, np.int32)
    cols = np.empty(nnz, np.int32)
    vals = np.empty(nnz, np.float64)
    rc = lib.mtx_parse_mt(
        path.encode(), nlines, nnz,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), 7)
    assert rc == 0
    got2 = sp.coo_matrix((vals, (rows, cols)), shape=(nn, mm))
    np.testing.assert_array_equal(got2.toarray(), mat.toarray())
