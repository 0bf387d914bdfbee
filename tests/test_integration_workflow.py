"""Integration test: the full vignette workflow on the BUNDLED
synthetic dataset (ccfindr_tpu/data/pbmc_sim — five planted immune
cell types) — read 10x, QC, VB rank sweep, optimal_rank (ground
truth: ropt = 5, the planted rank), clustering, tree, GSEA cell
typing.  Self-contained: runs without the /root/reference mount
(reference's analogous fixture: inst/extdata; workflow:
vignettes/ccfindR.Rmd:122-477)."""

import numpy as np
import pytest

import ccfindr_tpu as cf


@pytest.fixture(scope="module")
def sim(data_dir):
    return cf.read_10x(data_dir)


@pytest.fixture(scope="module")
def sim_factorized(sim):
    s = cf.filter_cells(sim, umi_min=700, umi_max=8000, plot=False)
    s = cf.filter_genes(s, vmr_min=1.2, min_cells_expressed=50,
                        plot=False, verbose=False)
    return cf.vb_factorize(s, ranks=list(range(2, 9)), nrun=3,
                           verbose=0, Itmax=3000, seed=0)


def test_bundled_loads(sim):
    assert sim.n_genes == 737
    assert sim.n_cells == 450
    assert sim.counts.nnz == 214216


def test_bundled_optimal_rank_is_5(sim_factorized):
    """Rank scan recovers the planted rank 5 (analog of the vignette's
    ropt=5 ground truth, ccfindR.Rmd:414-423)."""
    opt = cf.optimal_rank(sim_factorized)
    assert opt["ropt"] == 5, f"expected ropt=5, got {opt}"


def test_bundled_evidence_profile(sim_factorized):
    me = sim_factorized.measure
    ranks = list(me["rank"])
    # degeneracy may abort the scan above rank 6 (unif_stop), but the
    # profile must cover the planted rank and be finite
    assert ranks[0] == 2 and 6 in ranks
    assert ranks == list(range(2, 2 + len(ranks)))
    assert np.isfinite(me["lml"]).all()
    lml = me.set_index("rank")["lml"]
    assert lml[5] > lml[2]
    assert lml[5] >= lml[ranks[-1]]


def test_bundled_clusters_and_tree(sim_factorized, data_dir):
    cid = cf.cluster_id(sim_factorized, rank=5)
    assert set(cid.unique()) == {1, 2, 3, 4, 5}
    # hard assignments recover the planted labels (up to relabeling)
    import os
    labels = np.loadtxt(os.path.join(data_dir, "labels.tsv"), dtype=int)
    # map filtered cells back to planted labels by barcode position
    all_bc = open(os.path.join(data_dir, "barcodes.tsv")).read().split()
    pos = [all_bc.index(b) for b in sim_factorized.col_data.index]
    lab = labels[pos]
    # concordance: best 1-1 mapping of clusters to planted labels
    from scipy.optimize import linear_sum_assignment
    cm = np.zeros((5, 5))
    for c, l in zip(cid.to_numpy() - 1, lab):
        cm[c, l] += 1
    r, c = linear_sum_assignment(-cm)
    concord = cm[r, c].sum() / len(lab)
    assert concord > 0.95, f"cluster concordance {concord:.3f}"

    tree = cf.build_tree(sim_factorized, rmax=5)
    nwk = cf.newick(tree)
    for tip in ("5.1", "5.2", "5.3", "5.4", "5.5"):
        assert tip in nwk


def test_bundled_celltype_assignment(sim_factorized):
    markers = {
        "B cell": ["CD74", "IG", "HLA", "MS4A1", "CD79A"],
        "CD8+ T": ["CD8A", "CD8B", "GZMK", "CCR7", "LTB"],
        "CD4+ T": ["CD3D", "CD3E", "IL7R", "LEF1"],
        "NK": ["GNLY", "NKG7", "GZMA", "GZMH"],
        "Macrophage": ["S100A8", "S100A9", "CD14", "LYZ", "CFD"],
    }
    gene_names = sim_factorized.row_data.iloc[:, 1].to_numpy()
    es = cf.assign_celltype(sim_factorized, rank=5, gset=markers,
                            gene_names=gene_names,
                            grp_prefix=("IG", "HLA"))
    assert es.shape == (5, 5)
    best = es.idxmax(axis=0)
    assert best.nunique() == 5      # every planted type found
