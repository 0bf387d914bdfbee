"""Integration test: the reference vignette workflow on the bundled
PBMC data (vignettes/ccfindR.Rmd:122-477) — read 10x, QC, VB rank
sweep, optimal_rank (scientific ground truth: ropt = 5, the five
purified immune subsets), clustering, tree, GSEA cell typing."""

import numpy as np
import pytest

import ccfindr_tpu as cf


@pytest.fixture(scope="module")
def pbmc(pbmc_dir):
    return cf.read_10x(pbmc_dir)


@pytest.fixture(scope="module")
def pbmc_factorized(pbmc):
    """The vignette workflow (ccfindR.Rmd:236-379): QC-filter cells and
    genes, then VB rank sweep — the ropt=5 ground truth is stated for
    the filtered matrix (ccfindR.Rmd:414-423)."""
    s = cf.filter_cells(pbmc, umi_min=300, umi_max=10000, plot=False)
    s = cf.filter_genes(s, vmr_min=1.2, min_cells_expressed=50,
                        plot=False, verbose=False)
    return cf.vb_factorize(s, ranks=list(range(2, 9)), nrun=3,
                           verbose=0, Itmax=3000, seed=0)


def test_pbmc_loads(pbmc):
    assert pbmc.n_genes == 1030
    assert pbmc.n_cells == 450
    assert pbmc.counts.nnz == 91200


def test_pbmc_optimal_rank_is_5(pbmc_factorized):
    """The vignette's scientific baseline: rank scan identifies r=5
    (ccfindR.Rmd:414-423)."""
    opt = cf.optimal_rank(pbmc_factorized)
    assert opt["ropt"] == 5, f"expected ropt=5, got {opt}"


def test_pbmc_evidence_profile_shape(pbmc_factorized):
    me = pbmc_factorized.measure
    assert list(me["rank"]) == list(range(2, 9))
    assert np.isfinite(me["lml"]).all()
    # evidence at 5 beats the scan edges
    lml = me.set_index("rank")["lml"]
    assert lml[5] > lml[2]
    assert lml[5] >= lml[8]


def test_pbmc_clusters_and_tree(pbmc_factorized):
    cid = cf.cluster_id(pbmc_factorized, rank=5)
    assert len(cid) == 450
    assert set(cid.unique()) == {1, 2, 3, 4, 5}
    tree = cf.build_tree(pbmc_factorized, rmax=5)
    nwk = cf.newick(tree)
    for tip in ("5.1", "5.2", "5.3", "5.4", "5.5"):
        assert tip in nwk


def test_pbmc_celltype_assignment(pbmc_factorized):
    """Marker-based GSEA finds each major cell type in some cluster
    (vignette marker sets, R/gsea.R:33-37)."""
    markers = {
        "B cell": ["CD74", "IG", "HLA"],
        "CD8+ T": ["CD8A", "CD8B", "GZMK", "CCR7", "LTB"],
        "CD4+ T": ["CD3D", "CD3E", "IL7R", "LEF1"],
        "NK": ["GNLY", "NKG7", "GZMA", "GZMH"],
        "Macrophage": ["S100A8", "S100A9", "CD14", "LYZ", "CFD"],
    }
    gene_names = pbmc_factorized.row_data.iloc[:, 1].to_numpy()
    es = cf.assign_celltype(pbmc_factorized, rank=5, gset=markers,
                            gene_names=gene_names,
                            grp_prefix=("IG", "HLA"))
    assert es.shape == (5, 5)
    # each cluster's best cell type is distinct for at least 4 clusters
    best = es.idxmax(axis=0)
    assert best.nunique() >= 4
