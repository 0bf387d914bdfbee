"""API-surface parity vs the reference package.

The compatibility contract (SURVEY.md §1, §7.4) is the reference's
NAMESPACE: 37 exported functions + 12 exported S4 methods
(/root/reference/NAMESPACE:3-51).  This test pins an explicit mapping
from every reference export to its equivalent here, so any future
rename or removal breaks loudly.
"""

import numpy as np

import ccfindr_tpu as cf

# reference exported function -> top-level name in ccfindr_tpu
# (/root/reference/NAMESPACE:8-38; '.'->'_' renames noted inline)
EXPORTED_FUNCTIONS = {
    "assignCelltype": "assign_celltype",   # snake_case (alias kept)
    "build_tree": "build_tree",
    "cell_map": "cell_map",
    "cluster_id": "cluster_id",
    "factorize": "factorize",
    "feature_map": "feature_map",
    "filter_cells": "filter_cells",
    "filter_genes": "filter_genes",
    "gene_map": "gene_map",
    "meta_gene.cv": "meta_gene_cv",
    "meta_genes": "meta_genes",
    "newick": "newick",
    "normalize_count": "normalize_count",
    "optimal_rank": "optimal_rank",
    "plot_genes": "plot_genes",
    "plot_tree": "plot_tree",
    "read_10x": "read_10x",
    "remove_zeros": "remove_zeros",
    "rename_tips": "rename_tips",
    "scNMFSet": "scNMFSet",                # alias of SCSet
    "simulate_data": "simulate_data",
    "simulate_whx": "simulate_whx",
    "vb_factorize": "vb_factorize",
    "visualize_clusters": "visualize_clusters",
    "write_10x": "write_10x",
    "write_meta": "write_meta",
}

# reference S4 accessors/generics -> SCSet attribute or method
# (/root/reference/NAMESPACE:3-7, 39-51).  Slot getters and their
# `<-` setters map to plain read/write attributes or properties;
# `show` -> __repr__, `[` subsetting -> __getitem__.
CONTAINER_SURFACE = {
    "counts": "counts",
    "ranks": "ranks",
    "basis": "basis",
    "dbasis": "dbasis",
    "coeff": "coeff",
    "dcoeff": "dcoeff",
    "measure": "measure",
    "rowData": "row_data",
    "colData": "col_data",
    "plot": "plot",
    "show": "__repr__",
    "[": "__getitem__",
}


def test_every_reference_export_has_an_equivalent():
    missing = [ref for ref, name in EXPORTED_FUNCTIONS.items()
               if not callable(getattr(cf, name, None))]
    assert not missing, f"missing exports: {missing}"


def test_every_export_is_in_api_index():
    # container methods/dunders live on SCSet, not in __all__
    methods = {"ranks", "basis", "dbasis", "coeff", "dcoeff",
               "measure", "row_data", "col_data", "counts", "plot",
               "__repr__", "__getitem__"}
    for name in EXPORTED_FUNCTIONS.values():
        if name in methods:
            assert hasattr(cf.SCSet, name) or hasattr(cf, name)
        else:
            assert name in cf.__all__, name


def test_container_surface():
    rng = np.random.default_rng(0)
    s = cf.SCSet(count=rng.poisson(2.0, size=(6, 9)))
    missing = [ref for ref, name in CONTAINER_SURFACE.items()
               if not hasattr(s, name)]
    assert not missing, f"missing container surface: {missing}"
    # the `<-` setter forms: these must be writable
    s2 = cf.SCSet(count=rng.poisson(2.0, size=(6, 9)))
    for attr in ("ranks", "basis", "dbasis", "coeff", "dcoeff",
                 "measure", "row_data", "col_data", "counts"):
        setattr(s2, attr, getattr(s, attr))
    # subsetting slices both axes coherently (reference `[`,
    # R/scNMF_class.R:297-322)
    sub = s[1:4, 2:5]
    assert sub.shape == (3, 3)


def test_scnmfset_alias():
    assert cf.scNMFSet is cf.SCSet
