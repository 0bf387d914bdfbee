"""Consensus-clustering statistics (host-side NumPy/SciPy).

Equivalents of reference connectivity/dispersion/cophenet
(R/factorize.R:51-78).  These are O(m^2) post-processing statistics on
hard cluster assignments, computed on the host after device runs finish.
"""

from __future__ import annotations

import numpy as np
import scipy.cluster.hierarchy as sch


def connectivity(h=None, cid=None) -> np.ndarray:
    """Comembership indicator over cell pairs, condensed (upper-tri
    row-major, matching R's t(cnn)[lower.tri] ordering;
    reference R/factorize.R:51-59)."""
    if cid is None:
        cid = np.asarray(np.argmax(np.asarray(h), axis=0))
    else:
        cid = np.asarray(cid)
    eq = cid[:, None] == cid[None, :]
    iu = np.triu_indices(len(cid), k=1)
    return eq[iu].astype(np.float64)


def dispersion(cnn: np.ndarray, nc: int) -> float:
    """Dispersion rho of a (mean) connectivity vector
    (reference R/factorize.R:62-66)."""
    con = np.sum((cnn - 0.5) ** 2)
    return 1.0 / nc + 8.0 * con / nc ** 2


def cophenet(conav: np.ndarray, nc: int, method: str = "average") -> float:
    """Cophenetic correlation of hierarchical clustering on the
    consensus-distance matrix (reference R/factorize.R:69-78)."""
    d = 1.0 - np.asarray(conav)
    z = sch.linkage(d, method=method)
    coph_corr, _ = sch.cophenet(z, d)
    return float(coph_corr)
