"""Maximum-likelihood (Lee–Seung KL) NMF kernels in JAX.

TPU redesign of the reference's ML path (R/factorize.R:2-49): one
multiplicative sweep = 4 rank-r GEMMs on the MXU; the convergence loop
is a ``lax.while_loop`` batched over restarts with ``vmap``.

The 'connectivity' stopping criterion compares hard cluster partitions
between consecutive sweeps.  The reference materializes the
m(m-1)/2 comembership vector (R/factorize.R:51-59); here partition
equality is decided from the r x r contingency table (two partitions
induce identical comembership iff the table is a sub-permutation), so
the criterion costs O(m + r^2) instead of O(m^2) and fits in jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _dot(a, b):
    acc = jnp.promote_types(a.dtype, jnp.float32)
    return lax.dot(a, b, precision=lax.Precision.HIGHEST,
                   preferred_element_type=acc)


def ml_sweep(x, w, h, eps):
    """One KL multiplicative update of H then W
    (reference nmf_updateR, R/factorize.R:2-27)."""
    h = h * _dot(w.T, x / _dot(w, h)) / jnp.sum(w, axis=0)[:, None]
    h = jnp.maximum(h, eps)
    w = w * _dot(x / _dot(w, h), h.T) / jnp.sum(h, axis=1)[None, :]
    w = jnp.maximum(w, eps)
    return w, h


def likelihood(x, w, h, lgx_zero_term):
    """Per-element Poisson log-likelihood, KL form
    (reference R/factorize.R:40-49).

    ``lgx_zero_term`` = sum_{x>0}(-x log x + x), a per-dataset constant
    hoisted out of the loop.
    """
    wh = _dot(w, h)
    val = jnp.sum(x * jnp.log(wh) - wh) + lgx_zero_term
    return val / (x.shape[0] * x.shape[1])


def likelihood_const(x):
    """The data-only term sum_{x>0}(-x log x + x) of the likelihood."""
    xl = jnp.where(x > 0, -x * jnp.log(jnp.where(x > 0, x, 1.0)) + x, 0.0)
    return jnp.sum(xl)


def hard_assign(h) -> jax.Array:
    """argmax cluster id per cell (0-based)."""
    return jnp.argmax(h, axis=0).astype(jnp.int32)


def partitions_equal(cid0, cid1, r: int) -> jax.Array:
    """True iff two hard assignments induce the same comembership.

    Builds the r x r contingency table; the partitions are equal iff
    every nonzero row and column of the table has exactly one nonzero
    entry.
    """
    idx = cid0 * r + cid1
    tab = jnp.zeros((r * r,), jnp.int32).at[idx].add(1).reshape(r, r)
    nz = tab > 0
    rows_ok = jnp.all(jnp.sum(nz, axis=1) <= 1)
    cols_ok = jnp.all(jnp.sum(nz, axis=0) <= 1)
    return rows_ok & cols_ok


class MLRunResult(NamedTuple):
    w: jax.Array
    h: jax.Array
    lkh: jax.Array
    n_iter: jax.Array
    cid: jax.Array


@partial(jax.jit, static_argnames=("itmax", "criterion", "ncnn_step"))
def ml_run(x, w0, h0, *, itmax: int = 10000, tol: float = 1e-5,
           criterion: str = "likelihood",
           ncnn_step: int = 40) -> MLRunResult:
    """Iterate ml_sweep to convergence for one restart
    (reference driver loop R/factorize.R:187-213).

    criterion='likelihood': stop when |lkold - lk| < tol*|lkold|.
    criterion='connectivity': stop after ``ncnn_step`` consecutive
    sweeps with an unchanged hard-cluster partition.
    """
    eps = jnp.asarray(jnp.finfo(x.dtype).eps, x.dtype)
    tol = jnp.asarray(tol, x.dtype)
    lgconst = likelihood_const(x)
    r = h0.shape[0]

    if criterion == "likelihood":
        def cond(c):
            it, w, h, lkold, lk0, done = c
            return (~done) & (it <= itmax)

        def body(c):
            it, w, h, lkold, lk0, _ = c
            w, h = ml_sweep(x, w, h, eps)
            lk = likelihood(x, w, h, lgconst)
            done = jnp.abs(lkold - lk) < tol * jnp.abs(lkold)
            return it + 1, w, h, lk, lk, done

        neginf = jnp.asarray(-jnp.inf, x.dtype)
        it, w, h, lkold, lk0, done = lax.while_loop(
            cond, body, (jnp.asarray(1), w0, h0, neginf, neginf,
                         jnp.asarray(False)))
    elif criterion == "connectivity":
        def cond(c):
            it, w, h, lk0, cid0, zstep, done = c
            return (~done) & (it <= itmax)

        def body(c):
            it, w, h, _, cid0, zstep, _ = c
            w, h = ml_sweep(x, w, h, eps)
            lk = likelihood(x, w, h, lgconst)
            cid = hard_assign(h)
            same = (it > 1) & partitions_equal(cid0, cid, r)
            zstep = jnp.where(same, zstep + 1, jnp.asarray(0, jnp.int32))
            done = zstep == ncnn_step
            return it + 1, w, h, lk, cid, zstep, done

        it, w, h, lk0, _, _, done = lax.while_loop(
            cond, body, (jnp.asarray(1), w0, h0,
                         jnp.asarray(-jnp.inf, x.dtype),
                         jnp.zeros((x.shape[1],), jnp.int32),
                         jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    else:
        raise ValueError("Unknown stopping criterion.")

    return MLRunResult(w=w, h=h, lkh=lk0, n_iter=it - 1,
                       cid=hard_assign(h))


def ml_init(key, n, m, rank, dtype=jnp.float32):
    """Uniform-random init (reference R/factorize.R:30-38)."""
    kw, kh = jax.random.split(key)
    w = jax.random.uniform(kw, (n, rank), dtype)
    h = jax.random.uniform(kh, (rank, m), dtype)
    return w, h
