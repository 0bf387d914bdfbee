"""Metagene extraction / visualization layer tests."""

import numpy as np
import pandas as pd

import ccfindr_tpu as cf


def _factorized_object():
    n, m, r = 12, 10, 3
    rng = np.random.default_rng(0)
    s = cf.SCSet(count=rng.poisson(3, size=(n, m)) + 1,
                 row_data=[f"g{i}" for i in range(n)],
                 col_data=[f"c{j}" for j in range(m)])
    w = rng.gamma(2.0, 1.0, size=(n, r))
    # plant clear metagenes: rows 0-3 cluster 1, 4-7 cluster 2, ...
    for k in range(r):
        w[4 * k:4 * (k + 1), k] *= 20
    h = rng.gamma(2.0, 1.0, size=(r, m))
    s.ranks = [r]
    s.basis = [w]
    s.dbasis = [np.sqrt(w)]
    s.coeff = [h]
    s.dcoeff = [np.sqrt(h)]
    s.measure = pd.DataFrame({"rank": [r], "lml": [-1.0]})
    return s


def test_meta_genes_max_scheme():
    s = _factorized_object()
    meta = cf.meta_genes(s, rank=3, max_per_cluster=4)
    assert len(meta) == 3
    assert set(meta[0]) == {"g0", "g1", "g2", "g3"}
    assert set(meta[1]) == {"g4", "g5", "g6", "g7"}


def test_meta_genes_from_matrix():
    s = _factorized_object()
    meta = cf.meta_genes(basis_matrix=s.basis[0], max_per_cluster=2)
    assert len(meta) == 3
    assert all(len(mk) <= 2 for mk in meta)


def test_meta_gene_cv_table():
    s = _factorized_object()
    tab = cf.meta_gene_cv(s, rank=3, max_per_cluster=5)
    assert list(tab.columns) == ["Gene_1", "W_1", "CV_1", "Gene_2",
                                 "W_2", "CV_2", "Gene_3", "W_3", "CV_3"]
    assert tab["Gene_1"].iloc[0] in {"g0", "g1", "g2", "g3"}


def test_write_meta(tmp_path):
    s = _factorized_object()
    meta = cf.meta_genes(s, rank=3, max_per_cluster=4)
    path = tmp_path / "meta.csv"
    cf.write_meta(meta, str(path))
    df = pd.read_csv(path, index_col=0)
    assert df.shape[1] == 3


def test_heatmaps_and_tsne_run():
    s = _factorized_object()
    assert cf.gene_map(s, rank=3) is not None
    # hierarchical row ordering + dendrogram panel (the reference's
    # stats::heatmap revC=TRUE visual, R/utils.R:416-418)
    ax = cf.gene_map(s, rank=3, row_cluster=True)
    assert ax is not None
    assert len(ax.get_yticklabels()) > 2
    assert cf.feature_map(s, rank=3) is not None
    assert cf.cell_map(s, rank=3) is not None
    axes = cf.visualize_clusters(s, rank=3)
    assert len(axes) == 2


def test_plot_measure_bayes():
    s = _factorized_object()
    s.measure = pd.DataFrame({"rank": [2, 3, 4],
                              "lml": [-2.0, -1.0, -1.5]})
    assert s.plot() is not None
