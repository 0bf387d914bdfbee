"""Container, I/O, QC, and simulator tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

import ccfindr_tpu as cf


def test_scset_basic(rng):
    x = rng.poisson(3, size=(8, 5))
    x[0] += 1  # ensure no empty first row after poisson
    s = cf.SCSet(count=x, remove_zeros=False)
    assert s.shape == (8, 5)
    assert (s.counts.toarray() == x).all()


def test_scset_rejects_negative():
    with pytest.raises(ValueError, match="negative"):
        cf.SCSet(count=np.array([[1, -2], [0, 3]]))


def test_remove_zeros():
    x = np.array([[1, 0, 2], [0, 0, 0], [3, 0, 1]])
    s = cf.SCSet(count=x, remove_zeros=True)
    assert s.shape == (2, 2)
    out = cf.remove_zeros(x)
    assert out.shape == (2, 2)


def test_subsetting_slices_factors(rng):
    x = rng.poisson(3, size=(10, 6)) + 1
    s = cf.SCSet(count=x)
    s.ranks = [2]
    s.basis = [rng.random((10, 2))]
    s.dbasis = [rng.random((10, 2))]
    s.coeff = [rng.random((2, 6))]
    s.dcoeff = [rng.random((2, 6))]
    sub = s[np.arange(3), np.arange(4)]
    assert sub.counts.shape == (3, 4)
    assert sub.basis[0].shape == (3, 2)
    assert sub.coeff[0].shape == (2, 4)
    assert sub.dbasis[0].shape == (3, 2)
    assert sub.dcoeff[0].shape == (2, 4)


def test_validity():
    s = cf.SCSet(count=np.ones((3, 3)))
    s.ranks = [2, 3]
    s.basis = [np.ones((3, 2))]
    s.coeff = [np.ones((2, 3))]
    with pytest.raises(ValueError, match="length do not match"):
        s.validate()


def test_read_10x_pbmc(pbmc_dir):
    s = cf.read_10x(pbmc_dir)
    assert s.n_genes <= 1030 and s.n_cells <= 450
    assert s.counts.nnz > 0
    # values: spot check against the raw file header
    assert s.row_data.shape[1] >= 2  # ensembl id + symbol


def test_write_read_roundtrip(tmp_path, rng):
    x = sp.random(20, 15, density=0.3, random_state=7,
                  data_rvs=lambda k: rng.integers(1, 9, k)).tocsr()
    x[0, 0] = 1  # no empty row 0
    s = cf.SCSet(count=x, row_data=[f"g{i}" for i in range(20)],
                 col_data=[f"c{j}" for j in range(15)],
                 remove_zeros=False)
    cf.write_10x(s, str(tmp_path))
    s2 = cf.read_10x(str(tmp_path), remove_zeros=False)
    np.testing.assert_allclose(s.counts.toarray(), s2.counts.toarray())


def test_filter_cells(rng):
    x = rng.poisson(3, size=(40, 30))
    s = cf.SCSet(count=x)
    umi = np.asarray(s.counts.sum(axis=0)).ravel()
    lo, hi = np.quantile(umi, [0.2, 0.8])
    f = cf.filter_cells(s, umi_min=lo, umi_max=hi)
    assert f.n_cells == ((umi >= lo) & (umi <= hi)).sum() or \
        f.n_cells <= ((umi >= lo) & (umi <= hi)).sum()  # zeros removed


def test_calc_vmr_matches_dense(rng):
    x = rng.poisson(1.5, size=(25, 40)).astype(float)
    xs = sp.csr_matrix(x)
    vmr = cf.calc_vmr(xs)
    mean = x.mean(axis=1)
    var = x.var(axis=1, ddof=1)
    np.testing.assert_allclose(vmr, var / mean, rtol=1e-10)


def test_filter_genes(rng):
    x = rng.poisson(2, size=(50, 30))
    x[:5] *= 10  # high-variance genes
    s = cf.SCSet(count=x, remove_zeros=False)
    f = cf.filter_genes(s, vmr_min=1.0, min_cells_expressed=5,
                        verbose=False)
    assert 0 < f.n_genes <= 50


def test_has_mode():
    assert cf.has_mode(np.array([0, 0, 1, 2, 2, 2, 3]))   # mode at 2
    assert not cf.has_mode(np.array([0, 0, 0, 1]))         # monotone dec
    assert not cf.has_mode(np.array([5, 5, 5]))            # single value


def test_normalize_count(rng):
    x = rng.poisson(3, size=(30, 20)) + 1
    s = cf.SCSet(count=x)
    ns = cf.normalize_count(s)
    umi = np.asarray(ns.counts.sum(axis=0)).ravel()
    np.testing.assert_allclose(umi, np.median(x.sum(axis=0)), rtol=1e-10)


def test_simulate_whx_properties():
    sim = cf.simulate_whx(nrow=50, ncol=100, rank=5, seed=1)
    assert sim["x"].shape[0] <= 50 and sim["x"].shape[1] <= 100
    assert sim["w"].shape[1] == 5 and sim["h"].shape[0] == 5
    assert (sim["x"] >= 0).all()
    assert (sim["x"].sum(axis=1) > 0).all()
    assert (sim["x"].sum(axis=0) > 0).all()


def test_simulate_data_multinomial():
    x = cf.simulate_data(nfeatures=10, nsamples=[20, 20, 60], seed=2)
    assert x.shape == (10, 100)
    np.testing.assert_allclose(x.sum(axis=0), 100)  # size = 10*10


def test_simulate_data_factors():
    sim = cf.simulate_data(nfeatures=12, nsamples=[10, 15, 20],
                           generate_factors=True, seed=3)
    assert sim["x"].shape == (12, 45)
    assert sim["w"].shape == (12, 3)
    assert sim["h"].shape == (3, 45)


def test_checkpoint_roundtrip(tmp_path, rng):
    x = rng.poisson(3, size=(10, 8)) + 1
    s = cf.SCSet(count=x)
    s.ranks = [2]
    s.basis = [rng.random((10, 2))]
    s.dbasis = [rng.random((10, 2))]
    s.coeff = [rng.random((2, 8))]
    s.dcoeff = [rng.random((2, 8))]
    s.measure = pd.DataFrame({"rank": [2], "lml": [-1.5]})
    # non-scalar metadata (e.g. the profiling timings list) must
    # round-trip losslessly; non-JSON-able values warn, not vanish
    s.metadata["timings"] = [{"label": "sweep", "seconds": 0.5}]
    s.metadata["np_scalar"] = np.float32(2.5)
    s.metadata["unserializable"] = object()
    path = str(tmp_path / "ckpt")
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        cf.save_checkpoint(s, path)
    assert any("unserializable" in str(r.message) for r in rec)
    # resume scenario: fresh carrier (new process) — only what was
    # persisted comes back
    fresh = cf.SCSet(count=x)
    s2 = cf.load_checkpoint(fresh, path)
    np.testing.assert_allclose(s2.basis[0], s.basis[0])
    assert s2.measure["lml"][0] == -1.5
    assert s2.metadata["timings"] == [{"label": "sweep", "seconds": 0.5}]
    assert s2.metadata["np_scalar"] == 2.5
    assert "unserializable" not in s2.metadata


def test_read_mtx_pattern_and_symmetric(tmp_path):
    """MatrixMarket pattern/symmetric variants (Matrix::readMM parity,
    reference R/utils.R:34)."""
    import scipy.io as sio

    p = tmp_path / "pat.mtx"
    p.write_text("%%MatrixMarket matrix coordinate pattern general\n"
                 "3 4 3\n1 1\n2 3\n3 4\n")
    got = cf.read_mtx(str(p))
    want = np.zeros((3, 4))
    want[0, 0] = want[1, 2] = want[2, 3] = 1
    np.testing.assert_array_equal(got.toarray(), want)

    s = tmp_path / "sym.mtx"
    s.write_text("%%MatrixMarket matrix coordinate integer symmetric\n"
                 "3 3 4\n1 1 5\n2 1 2\n3 2 7\n3 3 1\n")
    got = cf.read_mtx(str(s))
    want = sio.mmread(str(s)).toarray()
    np.testing.assert_array_equal(got.toarray(), want)

    bad = tmp_path / "arr.mtx"
    bad.write_text("%%MatrixMarket matrix array real general\n3 3\n")
    with pytest.raises(ValueError, match="'array'"):
        cf.read_mtx(str(bad))


def test_has_mode_rows_matches_scalar_loop(rng):
    """Vectorized rescue-mode detection == per-gene has_mode on dense
    rows (incl. all-zero rows, dense rows with no zeros, and rows with
    a single distinct value)."""
    import scipy.sparse as sp

    from ccfindr_tpu.qc import has_mode, has_mode_rows

    n, m = 60, 40
    x = rng.poisson(1.2, size=(n, m))
    x[rng.random((n, m)) < 0.5] = 0
    x[0] = 0                       # all-zero row
    x[1] = 3                       # constant nonzero row (no zeros)
    x[2] = rng.poisson(4.0, m) + 1  # dense row, no zeros
    csr = sp.csr_matrix(x)
    got = has_mode_rows(csr)
    want = np.array([has_mode(x[i]) for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_read_write_10x_v3_gzipped(tmp_path):
    """CellRanger v3 layout round-trip: gzipped matrix.mtx.gz +
    features.tsv.gz + barcodes.tsv.gz, auto-detected by read_10x."""
    import numpy as np

    import ccfindr_tpu as cf

    rng = np.random.default_rng(5)
    x = rng.poisson(1.0, size=(12, 9))
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    import pandas as pd
    s = cf.SCSet(count=x, remove_zeros=False,
                 row_data=pd.DataFrame({0: [f"G{i}" for i in range(12)]}),
                 col_data=pd.DataFrame({0: [f"BC{j}" for j in range(9)]}))
    d = str(tmp_path / "v3")
    cf.write_10x(s, d, version=3)
    import os
    assert sorted(os.listdir(d)) == ["barcodes.tsv.gz",
                                     "features.tsv.gz",
                                     "matrix.mtx.gz"]
    s2 = cf.read_10x(d, remove_zeros=False)
    np.testing.assert_array_equal(
        np.asarray(s2.counts_dense()), x)


def test_interop_soft_dependency_errors():
    """AnnData/h5py interop functions exist and raise a clear
    ImportError when the soft dependency is absent (and work when
    present — exercised by the skipif-gated tests below)."""
    import pytest

    import ccfindr_tpu as cf

    for fn in (cf.to_anndata, cf.read_h5ad, cf.read_10x_h5):
        assert callable(fn)
    try:
        import anndata  # noqa: F401
        has_anndata = True
    except ImportError:
        has_anndata = False
    if not has_anndata:
        s = cf.SCSet(count=np.ones((3, 4)))
        with pytest.raises(ImportError, match="anndata"):
            cf.to_anndata(s)


def test_anndata_roundtrip():
    """SCSet -> AnnData -> SCSet is lossless for counts, annotations,
    factors and the measure table (requires anndata)."""
    import pytest

    anndata = pytest.importorskip("anndata")  # noqa: F841

    import ccfindr_tpu as cf

    rng = np.random.default_rng(3)
    x = rng.poisson(2.0, size=(15, 20))
    x[x.sum(axis=1) == 0, 0] += 1
    x[0, x.sum(axis=0) == 0] += 1
    s = cf.vb_factorize(cf.SCSet(count=x), ranks=[2, 3], nrun=1,
                        verbose=0, Itmax=50)
    ad = cf.to_anndata(s)
    assert ad.shape == (20, 15)            # cells x genes
    s2 = cf.from_anndata(ad)
    np.testing.assert_array_equal(np.asarray(s2.counts_dense()),
                                  np.asarray(s.counts_dense()))
    assert s2.ranks == s.ranks
    for k in range(len(s.ranks)):
        np.testing.assert_allclose(s2.basis[k], s.basis[k])
        np.testing.assert_allclose(s2.coeff[k], s.coeff[k])
    np.testing.assert_allclose(s2.measure["lml"], s.measure["lml"])


def test_read_10x_h5_v3():
    """10x HDF5 v3 reader (requires h5py; file synthesized here)."""
    import tempfile

    import pytest

    h5py = pytest.importorskip("h5py")

    import ccfindr_tpu as cf
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    x = sp.csc_matrix(rng.poisson(1.0, size=(8, 6)))
    with tempfile.NamedTemporaryFile(suffix=".h5") as tf:
        with h5py.File(tf.name, "w") as f:
            g = f.create_group("matrix")
            g["data"] = x.data
            g["indices"] = x.indices
            g["indptr"] = x.indptr
            g["shape"] = np.asarray(x.shape)
            g["barcodes"] = np.asarray(
                [f"BC{i}" for i in range(6)], dtype="S")
            feat = g.create_group("features")
            feat["id"] = np.asarray(
                [f"ENSG{i}" for i in range(8)], dtype="S")
            feat["name"] = np.asarray(
                [f"G{i}" for i in range(8)], dtype="S")
        s = cf.read_10x_h5(tf.name)
    np.testing.assert_array_equal(np.asarray(s.counts_dense()),
                                  x.toarray())
    assert list(s.row_data[1]) == [f"G{i}" for i in range(8)]
