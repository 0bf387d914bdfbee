"""Fused Pallas TPU kernels for the ML (Lee-Seung KL) NMF sweep.

The reference's ML hot loop (R/factorize.R:2-27, 40-49) costs, per
sweep, five n x m GEMM-materializations under naive XLA: wh for the H
update, wh for the W update, and wh again for the likelihood, plus the
x/wh intermediates.  These kernels bring one sweep + likelihood down to
TWO passes over X:

* :func:`ml_h_pallas` — one pass computing BOTH the H-update numerator
  w^T (x / wh)  and  sum x*log(wh), the data part of the Poisson
  likelihood for the SAME (w, h).  Because the likelihood of sweep t
  is evaluated on the factors that enter sweep t+1's H update, the
  deferred-likelihood loop in ops.ml.ml_run(fused=...) gets it for
  free; the remaining -sum(wh) term reduces in rank space as
  dot(colsum w, rowsum h) outside the kernel.
* :func:`ml_w_pallas` — one pass computing the W-update numerator
  (x / wh) h^T  for the updated h.

Padding contract identical to the VB kernels (vb_kernels.py): X pads
with 0; W rows pad with 1, rank columns with 0; H rank rows with 0,
cell columns with 1 — wh stays positive, padded entries contribute
exactly nothing (x=0 kills both x/wh and x*log(wh)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vb_kernels import (DEFAULT_BN, DEFAULT_BM, _interpret,
                         _ksum2, _pad_factors, _recip_mul, _round_up,
                         pad_matrix)


def _ml_h_kernel(x_ref, w_ref, h_ref, hn_ref, acc_ref, *, bn):
    j = pl.program_id(0)
    i = pl.program_id(1)
    acc_t = jnp.promote_types(w_ref.dtype, jnp.float32)
    w = w_ref[pl.ds(i * bn, bn), :]
    h = h_ref[...]
    x = x_ref[...].astype(w.dtype)
    wh = jnp.dot(w, h, preferred_element_type=acc_t)
    a = _recip_mul(x, wh.astype(w.dtype)).astype(w.dtype)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)
        acc_ref[0, 1] = jnp.zeros((), acc_ref.dtype)

    @pl.when(i == 0)
    def _():
        hn_ref[...] = jnp.zeros_like(hn_ref)

    hn_ref[...] += jnp.dot(w.T, a, preferred_element_type=acc_t
                           ).astype(hn_ref.dtype)
    # x*log(wh): zero wherever x is zero, so padding contributes nothing
    _ksum2(acc_ref, jnp.sum(x * jnp.log(wh)))


def _ml_w_kernel(x_ref, w_ref, h_ref, wn_ref, *, bn):
    j = pl.program_id(0)
    i = pl.program_id(1)
    acc_t = jnp.promote_types(w_ref.dtype, jnp.float32)
    w = w_ref[pl.ds(i * bn, bn), :]
    h = h_ref[...]
    x = x_ref[...].astype(w.dtype)
    wh = jnp.dot(w, h, preferred_element_type=acc_t)
    a = _recip_mul(x, wh.astype(w.dtype)).astype(w.dtype)

    @pl.when((i == 0) & (j == 0))
    def _():
        wn_ref[...] = jnp.zeros_like(wn_ref)

    wn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
        a, h.T, preferred_element_type=acc_t).astype(wn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "m", "r", "bn", "bm"))
def _ml_h_padded(x_pad, w, h, *, n, m, r, bn, bm):
    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    w_p, h_p = _pad_factors(w, h, np_, mp_, rp_)
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(w.dtype, jnp.float32)

    hn, acc = pl.pallas_call(
        functools.partial(_ml_h_kernel, bn=bn),
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, rp_), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp_, mp_), acc_t),
            jax.ShapeDtypeStruct((1, 2), acc_t),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=np_ * mp_,
        ),
        interpret=_interpret(),
    )(x_pad, w_p, h_p)
    return (hn[:r, :m].astype(h.dtype), acc[0, 0].astype(w.dtype))


@functools.partial(jax.jit, static_argnames=("n", "m", "r", "bn", "bm"))
def _ml_w_padded(x_pad, w, h, *, n, m, r, bn, bm):
    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    w_p, h_p = _pad_factors(w, h, np_, mp_, rp_)
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(w.dtype, jnp.float32)

    wn = pl.pallas_call(
        functools.partial(_ml_w_kernel, bn=bn),
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, rp_), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_, rp_), lambda j, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, rp_), acc_t),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_pad, w_p, h_p)
    return wn[:n, :r].astype(w.dtype)


def ml_h_pallas(x, w, h, bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """(hn, xlogwh): H-update numerator w^T(x/wh) and sum x*log(wh)."""
    n, r = w.shape
    m = h.shape[1]
    return _ml_h_padded(pad_matrix(x, bn, bm), w, h, n=n, m=m, r=r,
                        bn=bn, bm=bm)


def ml_w_pallas(x, w, h, bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """W-update numerator (x/wh) h^T."""
    n, r = w.shape
    m = h.shape[1]
    return _ml_w_padded(pad_matrix(x, bn, bm), w, h, n=n, m=m, r=r,
                        bn=bn, bm=bm)


def make_ml_backend(bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """(fused_h, fused_w) pair for ops.ml.ml_run(fused_h=..., fused_w=...).
    Pre-pad X with :func:`pad_matrix` (same bn/bm)."""
    def fused_h(x, w, h):
        return ml_h_pallas(x, w, h, bn=bn, bm=bm)

    def fused_w(x, w, h):
        return ml_w_pallas(x, w, h, bn=bn, bm=bm)

    return fused_h, fused_w
