"""Maximum-likelihood factorization driver.

TPU-native equivalent of reference factorize (R/factorize.R:139-276):
rank sweep x nsmpl randomized replicates x nrun restarts, with restarts
batched on device via vmap.  Consensus statistics (connectivity /
dispersion / cophenetic) are host-side post-processing on the hard
assignments returned by each run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ..container import SCSet
from ..ops import ml as ml_ops
from ..ops import consensus as cons


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def factorize(object, ranks=2, nrun=20, randomize=False, nsmpl=1,
              verbose=2, Itmax=10000, ncnn_step=40,
              criterion="likelihood", linkage="average", Tol=1e-5,
              store_connectivity=False, dtype=None, seed=0,
              backend="dense"):
    """ML (Lee–Seung KL) NMF over a rank sweep.

    Mirrors reference factorize parameters (R/factorize.R:139-143).
    With ``randomize=True``, each of ``nsmpl`` replicates shuffles every
    column of the count matrix independently (null model for rank
    statistics) and measures are averaged with standard errors.

    ``backend``:

    * ``'dense'``       — eager XLA loop (parity oracle)
    * ``'dense_fused'`` — XLA, deferred-likelihood 2-passes-over-X loop
    * ``'pallas'``      — fused single-pass H/W Pallas kernels
    """
    if np.isscalar(ranks):
        ranks = [int(ranks)]
    ranks = [int(r) for r in ranks]
    if dtype is None:
        dtype = _default_dtype()

    if isinstance(object, SCSet):
        obj = object
    else:
        obj = SCSet(count=object, remove_zeros=False)
    mat0 = obj.counts_dense(dtype=np.dtype(dtype))
    n, m = mat0.shape
    if (mat0.sum(axis=1) == 0).any():
        raise ValueError("Input matrix contains empty rows")
    if (mat0.sum(axis=0) == 0).any():
        raise ValueError("Input matrix contains empty columns")

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    nrank = len(ranks)

    wdat, hdat = [None] * nrank, [None] * nrank
    rdat = [[] for _ in range(nrank)]
    ddat = [[] for _ in range(nrank)]
    cdat = [[] for _ in range(nrank)]
    conav_last = None

    for k, rank in enumerate(ranks):
        if verbose > 0:
            print(f"Rank {rank}")
        for ismpl in range(nsmpl):
            if randomize:
                mat = np.empty_like(mat0)
                for j in range(m):
                    mat[:, j] = rng.permutation(mat0[:, j])
            else:
                mat = mat0
            x = jnp.asarray(mat, dtype)
            run_kwargs = {}
            if backend == "dense_fused":
                run_kwargs = dict(fused_h=ml_ops.ml_h_dense,
                                  fused_w=ml_ops.ml_w_dense)
            elif backend == "pallas":
                from ..ops.pallas import ml_kernels as mlk
                fh, fw = mlk.make_ml_backend()
                x = mlk.pad_matrix(x)
                run_kwargs = dict(fused_h=fh, fused_w=fw,
                                  nm_true=(n, m))
            elif backend != "dense":
                raise ValueError(f"unknown backend {backend!r}")

            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, nrun)
            w0, h0 = jax.vmap(
                lambda kk: ml_ops.ml_init(kk, n, m, rank, dtype))(keys)
            batched = jax.vmap(
                lambda w, h: ml_ops.ml_run(
                    x, w, h, itmax=int(Itmax), tol=float(Tol),
                    criterion=criterion, ncnn_step=int(ncnn_step),
                    **run_kwargs))
            out = batched(w0, h0)
            out = jax.tree.map(np.asarray, out)

            # consensus over restarts (reference R/factorize.R:214-216)
            conav = np.zeros(m * (m - 1) // 2)
            rmax, wmax, hmax = -np.inf, None, None
            for i in range(nrun):
                cnn = cons.connectivity(cid=out.cid[i])
                conav += cnn
                lk = float(out.lkh[i])
                if (i == 0 or lk > rmax) and not np.isnan(lk):
                    rmax, wmax, hmax = lk, out.w[i], out.h[i]
                if verbose >= 2:
                    disp_i = cons.dispersion(conav / (i + 1), m)
                    print(f"Run #{i + 1}: Nsteps = {int(out.n_iter[i])}, "
                          f"likelihood = {lk:.6g}, "
                          f"dispersion = {disp_i:.6g}")
            disp = cons.dispersion(conav / nrun, m)
            coph = cons.cophenet(conav / nrun, m, method=linkage)
            conav_last = conav / nrun
            if verbose >= 1:
                print(f"Sample# {ismpl + 1}: Max(likelihood) = {rmax:.6g},"
                      f" dispersion = {disp:.6g}, cophenetic = {coph:.6g}")

            if ismpl == 0:
                wdat[k], hdat[k] = wmax.copy(), hmax.copy()
            else:
                wdat[k] += wmax
                hdat[k] += hmax
            rdat[k].append(rmax)
            ddat[k].append(disp)
            cdat[k].append(coph)

        wdat[k] /= nsmpl
        hdat[k] /= nsmpl

    rave = [float(np.mean(v)) for v in rdat]
    dave = [float(np.mean(v)) for v in ddat]
    cave = [float(np.mean(v)) for v in cdat]

    out_obj = obj[np.arange(obj.n_genes), np.arange(obj.n_cells)]
    out_obj.ranks = list(ranks)
    out_obj.basis = [np.asarray(w) for w in wdat]
    out_obj.coeff = [np.asarray(h) for h in hdat]
    out_obj.dbasis = [np.zeros_like(w) for w in wdat]
    out_obj.dcoeff = [np.zeros_like(h) for h in hdat]
    if randomize and nsmpl > 1:
        denom = np.sqrt(nsmpl - 1)
        rste = [float(np.std(v, ddof=1) / denom) for v in rdat]
        dste = [float(np.std(v, ddof=1) / denom) for v in ddat]
        cste = [float(np.std(v, ddof=1) / denom) for v in cdat]
        out_obj.measure = pd.DataFrame(dict(
            rank=ranks, likelihood=rave, r_se=rste, dispersion=dave,
            d_se=dste, cophenetic=cave, c_se=cste))
    else:
        out_obj.measure = pd.DataFrame(dict(
            rank=ranks, likelihood=rave, dispersion=dave,
            cophenetic=cave))
    if store_connectivity:
        out_obj.metadata = dict(nrun=nrun, connectivity=conav_last)
    out_obj.validate()
    return out_obj
