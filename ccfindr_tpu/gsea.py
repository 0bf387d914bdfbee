"""GSEA-based cell-type assignment.

Equivalent of reference R/gsea.R: weighted Kolmogorov–Smirnov
enrichment scores of marker gene sets in per-cluster ranked metagene
lists, with prefix-wildcard gene groups (e.g. 'IG', 'HLA') and
permutation p-values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .container import SCSet
from .interpret import meta_gene_cv


def overlap(query, glist, grp_prefix=("IG",)):
    """Membership of query genes in a marker set, with prefix groups
    matched as wildcards (reference R/gsea.R:117-128)."""
    query = np.asarray(query, dtype=object)
    glist = list(glist)
    glist0 = [g for g in glist if g not in grp_prefix]
    x = np.isin(query, glist0)
    for gr in (g for g in grp_prefix if g in glist):
        x1 = np.array([str(q).startswith(gr) for q in query])
        x = x | x1
    return x


def gsea_scores(glist, gwgt, gset, p=0.0, remove_na=False,
                grp_prefix=("IG", "KRT")):
    """Enrichment-score matrix: gene sets (rows) x clusters (cols)
    (reference R/gsea.R:79-115)."""
    rank = glist.shape[1]
    ns = len(gset)
    es = np.zeros((ns, rank))
    names = list(gset.keys())
    for k in range(rank):
        gl_full = glist.iloc[:, k].to_numpy(dtype=object)
        gw_full = gwgt.iloc[:, k].to_numpy(dtype=float)
        flag = ~pd.isna(gw_full)
        gl = gl_full[flag]
        gw = gw_full[flag]
        for i, nm in enumerate(names):
            gs = gset[nm]
            x = overlap(gl, gs, grp_prefix=grp_prefix)
            if x.sum() == 0:
                es[i, k] = np.nan
                continue
            ph = np.cumsum(x * gw ** p)
            phit = ph / ph[-1]
            y = ~np.isin(gl, list(gs))
            pm = np.cumsum(y)
            pmiss = pm / pm[-1]
            es[i, k] = np.max(phit - pmiss)
    out = pd.DataFrame(es, index=names,
                       columns=[str(k + 1) for k in range(rank)])
    if remove_na:
        out = out[~out.iloc[:, 0].isna()]
    return out


def assign_celltype(obj, rank, gset, gene_names=None, p=0.0,
                    remove_na=False, p_value=False, nperm=1000,
                    grp_prefix=("IG",), seed=0):
    """GSEA enrichment of marker sets in cluster metagene lists
    (reference assignCelltype, R/gsea.R:41-77).

    ``obj`` is an :class:`SCSet` (metagenes computed via meta_gene_cv)
    or a pre-built meta table (DataFrame with 3 columns per cluster).
    With ``p_value=True``, permutation p-values are estimated and a
    dict(ES=..., pvalue=...) is returned.
    """
    if isinstance(obj, SCSet):
        meta = meta_gene_cv(object=obj, rank=rank,
                            max_per_cluster=10 ** 9,
                            gene_names=gene_names, subtract_mean=True,
                            log=True, cv_max=np.inf)
    elif isinstance(obj, pd.DataFrame):
        meta = obj
        if meta.shape[1] != rank * 3:
            raise ValueError("Incorrect dimension of meta")
    else:
        raise TypeError("Incorrect input type of obj")

    glist = meta.iloc[:, range(0, 3 * rank, 3)]
    gwgt = meta.iloc[:, range(1, 3 * rank, 3)]

    es = gsea_scores(glist=glist, gwgt=gwgt, gset=gset, p=p,
                     remove_na=remove_na, grp_prefix=grp_prefix)
    if not p_value:
        return es

    rng = np.random.default_rng(seed)
    n = len(glist)
    ep = np.zeros_like(es.to_numpy())
    for _ in range(nperm):
        perm = rng.permutation(n)
        x = gsea_scores(glist=glist.iloc[perm].reset_index(drop=True),
                        gwgt=gwgt.iloc[perm].reset_index(drop=True),
                        gset=gset, p=p, remove_na=remove_na,
                        grp_prefix=grp_prefix)
        ep += (es.to_numpy() < x.to_numpy())
    ep = pd.DataFrame(ep / nperm, index=es.index, columns=es.columns)
    return {"ES": es, "pvalue": ep}


# Reference-compatible camelCase alias.
assignCelltype = assign_celltype
