"""Rank selection, smoothing spline, cluster tree, and GSEA tests."""

import numpy as np
import pandas as pd
import pytest

import ccfindr_tpu as cf
from ccfindr_tpu.select import smooth_spline_df, slope
from ccfindr_tpu import tree as tree_mod


# -- smoothing spline ------------------------------------------------

def test_spline_interpolates_at_full_df():
    x = np.arange(2, 9, dtype=float)
    y = -((x - 5.0) ** 2)
    fx, fy = smooth_spline_df(x, y, df=len(x))
    np.testing.assert_allclose(fy, y)


def test_spline_df_smooths():
    rng = np.random.default_rng(0)
    x = np.arange(2, 22, dtype=float)
    y = -((x - 10.0) ** 2) + rng.normal(0, 3, len(x))
    fx, fy = smooth_spline_df(x, y, df=5)
    # smoother fit has lower roughness than data
    rough = lambda v: np.sum(np.diff(v, 2) ** 2)
    assert rough(fy) < rough(y)
    # and df target met approximately inside the fit routine
    from ccfindr_tpu.select import _smoother
    xs = (x - x[0]) / (x[-1] - x[0])


def test_slope_mirrors_reference():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.array([0.0, 1.0, 3.0, 6.0])
    s = slope(y, x)
    np.testing.assert_allclose(s, [1.0, 2.0, 3.0, 3.0])


# -- optimal_rank ----------------------------------------------------

def test_optimal_rank_type1_interior_max():
    ranks = np.arange(2, 10)
    lml = -((ranks - 5.0) ** 2) * 0.01
    df = pd.DataFrame({"rank": ranks, "lml": lml})
    out = cf.optimal_rank(df, m=1000)
    assert out["type"] == 1
    assert out["ropt"] == 5


def test_optimal_rank_type2_plateau():
    ranks = np.arange(2, 10, dtype=float)
    lml = np.where(ranks < 5, -(5 - ranks) * 1.0, 0.0)
    df = pd.DataFrame({"rank": ranks, "lml": lml})
    out = cf.optimal_rank(df, m=1000)
    assert out["type"] == 2
    assert out["ropt"] == pytest.approx(5, abs=1)


def test_optimal_rank_requires_m_for_frame():
    df = pd.DataFrame({"rank": [2, 3], "lml": [0.0, 1.0]})
    with pytest.raises(ValueError):
        cf.optimal_rank(df)


# -- cluster_id ------------------------------------------------------

def test_cluster_id_one_based():
    s = cf.SCSet(count=np.ones((4, 3)))
    s.ranks = [2]
    s.basis = [np.ones((4, 2))]
    s.dbasis = [np.ones((4, 2))]
    s.coeff = [np.array([[0.9, 0.1, 0.5], [0.1, 0.9, 0.6]])]
    s.dcoeff = [np.ones((2, 3))]
    cid = cf.cluster_id(s, rank=2)
    np.testing.assert_array_equal(cid.to_numpy(), [1, 2, 2])


# -- tree ------------------------------------------------------------

def _toy_object_with_ranks():
    """Hand-built coeff matrices for ranks 2..4 with known hierarchy."""
    m = 12
    s = cf.SCSet(count=np.ones((5, m)))
    # rank2: cells 0-5 -> c1, 6-11 -> c2
    h2 = np.zeros((2, m)); h2[0, :6] = 1; h2[1, 6:] = 1
    # rank3: c1 splits into (0-2 -> 1, 3-5 -> 3); c2 -> 2
    h3 = np.zeros((3, m)); h3[0, :3] = 1; h3[2, 3:6] = 1; h3[1, 6:] = 1
    # rank4: cluster 2 (cells 6-11) splits into 2 and 4
    h4 = np.zeros((4, m))
    h4[0, :3] = 1; h4[2, 3:6] = 1; h4[1, 6:9] = 1; h4[3, 9:] = 1
    s.ranks = [2, 3, 4]
    s.coeff = [h2, h3, h4]
    s.basis = [np.ones((5, r)) for r in (2, 3, 4)]
    s.dbasis = [np.ones((5, r)) for r in (2, 3, 4)]
    s.dcoeff = [np.ones_like(h) for h in (h2, h3, h4)]
    return s


def test_build_tree_structure():
    s = _toy_object_with_ranks()
    tr = cf.build_tree(s, rmax=4)
    nwk = cf.newick(tr)
    assert nwk.endswith(";")
    # all rank-4 tips present
    for tip in ("4.1", "4.2", "4.3", "4.4"):
        assert tip in nwk
    # rank-2 cluster 1 split at rank 3 -> internal node keeps name 2.1;
    # rank-2 cluster 2 passed through rank 3 unchanged, so it was
    # renamed 2.2 -> 3.2 before splitting at rank 4 (same semantics as
    # reference update.tree/branch.tree, R/tree.R:41-65)
    assert "2.1" in nwk and "3.2" in nwk


def test_newick_branch_lengths():
    tr = ["2.1", ("2.2", ["4.2", "4.3"])]
    nwk = cf.newick(tr)
    assert nwk == "(2.1:1,(4.2:2,4.3:2)2.2:1);"


def test_rename_tips():
    tr = ["2.1", ("2.2", ["3.1", "3.2"])]
    out = cf.rename_tips(tr, rank=3, tip_labels=["A", "B"])
    assert out == ["2.1", ("2.2", ["3.A", "3.B"])]


def test_plot_tree_runs():
    s = _toy_object_with_ranks()
    tr = cf.build_tree(s, rmax=4)
    ax = cf.plot_tree(tr)
    assert ax is not None


# -- GSEA ------------------------------------------------------------

def test_overlap_prefix_groups():
    q = ["IGHV1", "CD8A", "FOO", "HLA-DRA"]
    x = cf.gsea.overlap(q, ["CD8A", "IG"], grp_prefix=("IG",))
    np.testing.assert_array_equal(x, [True, True, False, False])


def test_gsea_enrichment_ranks_marker_set_first():
    # cluster list where CD8 genes lead the ranking
    glist = pd.DataFrame({
        "Gene_1": ["CD8A", "CD8B", "GZMK", "X1", "X2", "X3"],
        "Gene_2": ["X1", "X2", "X3", "CD8A", "CD8B", "GZMK"]})
    gwgt = pd.DataFrame({
        "W_1": [5.0, 4.0, 3.0, 2.0, 1.0, 0.5],
        "W_2": [5.0, 4.0, 3.0, 2.0, 1.0, 0.5]})
    gl = glist.copy(); gl.columns = ["Gene_1", "Gene_2"]
    es = cf.gsea.gsea_scores(gl, gwgt,
                             {"CD8T": ["CD8A", "CD8B", "GZMK"]},
                             p=0.0, grp_prefix=())
    assert es.iloc[0, 0] > es.iloc[0, 1]
    assert es.iloc[0, 0] == pytest.approx(1.0)


def test_assign_celltype_with_frame():
    meta = pd.DataFrame({
        "Gene_1": ["CD8A", "CD8B", "X1", "X2"],
        "W_1": [4.0, 3.0, 2.0, 1.0],
        "CV_1": [0.1] * 4,
        "Gene_2": ["X1", "X2", "CD8A", "CD8B"],
        "W_2": [4.0, 3.0, 2.0, 1.0],
        "CV_2": [0.1] * 4})
    out = cf.assign_celltype(meta, rank=2,
                             gset={"CD8T": ["CD8A", "CD8B"]},
                             grp_prefix=())
    assert out.shape == (1, 2)
    assert out.iloc[0, 0] > out.iloc[0, 1]


def test_assign_celltype_pvalue():
    meta = pd.DataFrame({
        "Gene_1": ["CD8A", "CD8B", "X1", "X2", "X3", "X4"],
        "W_1": [6.0, 5.0, 4.0, 3.0, 2.0, 1.0],
        "CV_1": [0.1] * 6})
    out = cf.assign_celltype(meta, rank=1,
                             gset={"CD8T": ["CD8A", "CD8B"]},
                             grp_prefix=(), p_value=True, nperm=50)
    assert set(out) == {"ES", "pvalue"}
    assert 0 <= out["pvalue"].iloc[0, 0] <= 1


def test_smoother_matches_scipy_smoothing_spline():
    # differential test of the Reinsch-form smoother against scipy's
    # INDEPENDENT implementation (make_smoothing_spline, Woltring's
    # GCV-spline lineage) at identical lambda: both minimize
    # sum (y - f)^2 + lam * int f''^2 over natural cubic splines, so
    # fitted values must agree (no R available for smooth.spline
    # goldens; this pins the same spec from a second codebase)
    from scipy.interpolate import make_smoothing_spline

    from ccfindr_tpu.select import _smoother

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 10, 25))
    y = np.sin(x) + 0.1 * rng.standard_normal(25)
    for lam in (1e-3, 1e-1, 1.0, 10.0):
        ours = _smoother(x, lam) @ y
        sps = make_smoothing_spline(x, y, lam=lam)(x)
        np.testing.assert_allclose(ours, sps, atol=1e-8)


def test_spline_df_equals_trace_at_solution():
    # the bisection's lambda must reproduce the requested equivalent
    # degrees of freedom df = tr((I + lam*K)^-1)
    from ccfindr_tpu.select import _smoother

    rng = np.random.default_rng(1)
    x = np.arange(2.0, 22.0)
    y = np.log(x) + 0.05 * rng.standard_normal(20)
    xs = (x - x[0]) / (x[-1] - x[0])
    for df in (4.0, 7.0, 12.0):
        _, fitted = smooth_spline_df(x, y, df)
        # recover lambda by matching the fit, then check the trace
        lo, hi = -12.0, 12.0
        for _ in range(100):
            mid = 0.5 * (lo + hi)
            if np.trace(_smoother(xs, 10.0 ** mid)) > df:
                lo = mid
            else:
                hi = mid
        tr = np.trace(_smoother(xs, 10.0 ** (0.5 * (lo + hi))))
        assert abs(tr - df) < 1e-6
        np.testing.assert_allclose(
            fitted, _smoother(xs, 10.0 ** (0.5 * (lo + hi))) @ y,
            rtol=1e-10)


def test_gsea_perm_pvalues_match_serial_estimator():
    """The batched permutation scorer estimates the same null
    distribution as a serial re-scoring loop (agreement within Monte
    Carlo error)."""
    import pandas as pd

    from ccfindr_tpu.gsea import (_gsea_perm_pvalues, gsea_scores)

    rng = np.random.default_rng(5)
    genes = [f"G{i}" for i in range(60)]
    rank = 2
    glist = pd.DataFrame({
        f"l{k}": rng.permutation(genes) for k in range(rank)})
    gwgt = pd.DataFrame({
        f"w{k}": np.sort(rng.random(60))[::-1] for k in range(rank)})
    gset = {"setA": [f"G{i}" for i in range(0, 12)],
            "setB": [f"G{i}" for i in range(30, 40)]}
    es = gsea_scores(glist, gwgt, gset, p=1.0, grp_prefix=())

    nperm = 1500
    fast = _gsea_perm_pvalues(glist, gwgt, gset, es, p=1.0,
                              nperm=nperm, grp_prefix=(), seed=1)
    # serial oracle: re-score row-permuted tables
    srng = np.random.default_rng(2)
    ep = np.zeros_like(es.to_numpy())
    for _ in range(nperm):
        perm = srng.permutation(len(glist))
        x = gsea_scores(glist.iloc[perm].reset_index(drop=True),
                        gwgt.iloc[perm].reset_index(drop=True),
                        gset, p=1.0, grp_prefix=())
        ep += (es.to_numpy() < x.to_numpy())
    slow = ep / nperm
    np.testing.assert_allclose(fast.to_numpy(), slow, atol=0.06)
    # determinism
    again = _gsea_perm_pvalues(glist, gwgt, gset, es, p=1.0,
                               nperm=nperm, grp_prefix=(), seed=1)
    np.testing.assert_array_equal(fast.to_numpy(), again.to_numpy())
