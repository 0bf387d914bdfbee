"""ccfindr_tpu — TPU-native Bayesian NMF for single-cell count data.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
hjunwoo/ccfindR (Bioconductor): variational-Bayes and maximum-
likelihood Poisson NMF of sparse genes x cells count matrices,
evidence-based rank selection, metagene extraction, GSEA cell typing,
and rank-hierarchy cluster trees — redesigned for TPU meshes
(cell-sharded H, replicated W, batched restarts).

Public API mirrors the reference's NAMESPACE exports (NAMESPACE:3-51).
"""

from .container import SCSet, scNMFSet, remove_zeros  # noqa: F401
from .io import read_10x, write_10x, read_mtx, write_mtx  # noqa: F401
from .interop import (to_anndata, from_anndata, read_h5ad,  # noqa: F401
                      write_h5ad, read_10x_h5)
from .qc import (filter_cells, filter_genes, plot_genes,  # noqa: F401
                 normalize_count, calc_vmr, has_mode)
from .simulate import simulate_data, simulate_whx  # noqa: F401
from .drivers import vb_factorize, factorize  # noqa: F401
from .select import optimal_rank, cluster_id, smooth_spline_df  # noqa: F401
from .interpret import (meta_genes, meta_gene_cv, write_meta,  # noqa: F401
                        gene_map, feature_map, cell_map,
                        visualize_clusters, gene_select)
from .tree import (build_tree, newick, rename_tips,  # noqa: F401
                   plot_tree)
from .gsea import assign_celltype, assignCelltype  # noqa: F401
from .parallel import make_mesh, init_distributed  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint  # noqa: F401

# reference-compatible dotted-name alias (R: meta_gene.cv)
meta_gene = meta_gene_cv

__version__ = "0.1.0"

__all__ = [
    "SCSet", "scNMFSet", "remove_zeros",
    "read_10x", "write_10x", "read_mtx", "write_mtx",
    "to_anndata", "from_anndata", "read_h5ad", "write_h5ad",
    "read_10x_h5",
    "filter_cells", "filter_genes", "plot_genes", "normalize_count",
    "calc_vmr", "has_mode",
    "simulate_data", "simulate_whx",
    "vb_factorize", "factorize",
    "optimal_rank", "cluster_id", "smooth_spline_df",
    "meta_genes", "meta_gene_cv", "write_meta",
    "gene_map", "feature_map", "cell_map", "visualize_clusters",
    "gene_select",
    "build_tree", "newick", "rename_tips", "plot_tree",
    "assign_celltype", "assignCelltype",
    "make_mesh", "init_distributed",
    "save_checkpoint", "load_checkpoint",
]
