"""Fused Pallas TPU kernels for the VB-NMF sweep.

The reference's hot path materializes X/WH and runs separate dense
GEMMs per sweep (src/vbnmf_update.cpp:33-36, Eigen); under plain XLA
the n x m intermediate ``xwh = X / (lw @ lh)`` is written to HBM and
read back twice, and the ELBO data term costs three more n x m GEMM
materializations.  These kernels make the sweep HBM-bound on a single
read of X per pass:

* :func:`suffstats_pallas` — one pass over X tiles producing BOTH
  contractions  swn = (X/wth) @ lh^T  and  shn = lw^T @ (X/wth),
  with wth = lw @ lh recomputed per tile in VMEM (flops are cheap,
  bandwidth is not).  ``swn`` accumulates in a revisited output block
  (cell-tile j is the innermost grid axis); ``shn`` is written as
  per-row-block partials (rp/bn ~ 12% extra traffic) and reduced by
  XLA.
* :func:`elbo_data_pallas` — one pass over X computing the data ELBO
  term  -sum x * (S/wth - log wth),  S = (lw log lw) @ lh
  + lw @ (lh log lh),  accumulated in a scalar SMEM block.

Padding contract (zero extra contribution to every output; verified in
tests/test_pallas.py): X pads with 0; W rows pad with 1 and rank
columns with 0; H rank rows pad with 0 and cell columns with 1 — so
wth stays positive everywhere while padded X entries contribute
nothing.  On non-TPU backends the kernels run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BN = 1024
DEFAULT_BM = 512


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _recip_mul(x, wth):
    """x / wth via the hardware reciprocal approximation (f32 TPU
    production path only; f64 and interpret mode use exact division).

    Measured on v5e at the north-star shape: the exact f32 divide
    costs ~33 us/sweep of VPU time that the approx reciprocal
    eliminates entirely (215 -> 182 us, the kernel's mul floor).  Its
    ~6e-5 relative error is 20x BELOW the noise the default-precision
    (1-pass bf16) MXU GEMMs already inject into wth = lw @ lh, so the
    sufficient statistics lose no accuracy that the GEMM hasn't
    already spent — and CAVI is a fixed-point iteration: per-sweep
    perturbations at this level shift the converged posterior by
    far less than restart-to-restart variation (benchmarks/
    prof_reciprocal.py)."""
    if wth.dtype == jnp.float32 and not _interpret():
        return x * pl.reciprocal(wth, approx=True)
    return x / wth


def _round_up(v: int, mult: int) -> int:
    return -(-v // mult) * mult


def _ksum2(acc_ref, val):
    """Kahan-compensated accumulation into acc_ref[0, 0] with the
    compensation at acc_ref[0, 1]: the grid sums one f32 partial per
    tile sequentially, and at atlas grid sizes the naive running
    total's error reaches the order of Tol-level stopping decisions
    (SURVEY §7.3; same treatment as ops/pallas/sol.py _ksum)."""
    val = val.astype(acc_ref.dtype)
    c = acc_ref[0, 1]
    s = acc_ref[0, 0]
    y = val - c
    t = s + y
    acc_ref[0, 1] = (t - s) - y
    acc_ref[0, 0] = t


def pad_matrix(x, bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """Zero-pad a count matrix to tile boundaries (do once per
    factorization; zeros contribute nothing to any kernel output)."""
    n, m = x.shape
    np_, mp_ = _round_up(n, bn), _round_up(m, bm)
    if (np_, mp_) == (n, m):
        return x
    return jnp.pad(x, ((0, np_ - n), (0, mp_ - m)))


def _pad_factors(lw, lh, np_, mp_, rp_):
    """Pad W/H factors: W rows -> 1, rank -> 0; H rank -> 0, cols -> 1."""
    n, r = lw.shape
    m = lh.shape[1]
    lw_p = jnp.pad(lw, ((0, np_ - n), (0, 0)), constant_values=1.0)
    lw_p = jnp.pad(lw_p, ((0, 0), (0, rp_ - r)))
    lh_p = jnp.pad(lh, ((0, 0), (0, mp_ - m)), constant_values=1.0)
    lh_p = jnp.pad(lh_p, ((0, rp_ - r), (0, 0)))
    return lw_p, lh_p


# ---------------------------------------------------------------------
# Fused sufficient statistics
# ---------------------------------------------------------------------

def _suffstats_kernel(x_ref, lw_ref, lh_ref, swn_ref, shn_ref):
    j = pl.program_id(1)
    acc_t = jnp.promote_types(lw_ref.dtype, jnp.float32)
    lw = lw_ref[...]
    lh = lh_ref[...]
    wth = jnp.dot(lw, lh, preferred_element_type=acc_t)
    a = (x_ref[...] / wth).astype(lw.dtype)

    @pl.when(j == 0)
    def _():
        swn_ref[...] = jnp.zeros_like(swn_ref)

    swn_ref[...] += jnp.dot(a, lh.T, preferred_element_type=acc_t
                            ).astype(swn_ref.dtype)
    shn_ref[0] = jnp.dot(lw.T, a, preferred_element_type=acc_t
                         ).astype(shn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "m", "r", "bn", "bm"))
def suffstats_pallas_padded(x_pad, lw, lh, *, n, m, r, bn, bm):
    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    lw_p, lh_p = _pad_factors(lw, lh, np_, mp_, rp_)
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(lw.dtype, jnp.float32)

    swn, shn_part = pl.pallas_call(
        _suffstats_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp_, bm), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, rp_), acc_t),
            jax.ShapeDtypeStruct((ni, rp_, mp_), acc_t),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_pad, lw_p, lh_p)

    shn = jnp.sum(shn_part, axis=0)
    return (swn[:n, :r].astype(lw.dtype),
            shn[:r, :m].astype(lh.dtype))


def suffstats_pallas(x, lw, lh, bn: int = DEFAULT_BN,
                     bm: int = DEFAULT_BM):
    """Drop-in replacement for ops.vb.suffstats_dense: returns
    (sw, sh) = (lw * swn, lh * shn).  ``x`` may be pre-padded to the
    (bn, bm) grid; true shapes come from lw/lh."""
    n, r = lw.shape
    m = lh.shape[1]
    x_pad = pad_matrix(x, bn, bm)
    swn, shn = suffstats_pallas_padded(x_pad, lw, lh, n=n, m=m, r=r,
                                       bn=bn, bm=bm)
    return lw * swn, lh * shn


# ---------------------------------------------------------------------
# Fused ELBO data term
# ---------------------------------------------------------------------

def _elbo_kernel(x_ref, lw_ref, lh_ref, lwl_ref, lhl_ref, acc_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    acc_t = jnp.promote_types(lw_ref.dtype, jnp.float32)
    lw = lw_ref[...]
    lh = lh_ref[...]
    wth = jnp.dot(lw, lh, preferred_element_type=acc_t)
    s = (jnp.dot(lwl_ref[...], lh, preferred_element_type=acc_t)
         + jnp.dot(lw, lhl_ref[...], preferred_element_type=acc_t))
    t = x_ref[...] * (s / wth - jnp.log(wth))

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)
        acc_ref[0, 1] = jnp.zeros((), acc_ref.dtype)

    _ksum2(acc_ref, -jnp.sum(t))


@functools.partial(jax.jit, static_argnames=("n", "m", "r", "bn", "bm"))
def elbo_data_pallas_padded(x_pad, lw, lh, *, n, m, r, bn, bm):
    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    lw_p, lh_p = _pad_factors(lw, lh, np_, mp_, rp_)
    # padded factor entries are 0 or 1 -> define l*log(l) = 0 there
    lwl = jnp.where(lw_p > 0, lw_p * jnp.log(
        jnp.where(lw_p > 0, lw_p, 1.0)), 0.0).astype(lw_p.dtype)
    lhl = jnp.where(lh_p > 0, lh_p * jnp.log(
        jnp.where(lh_p > 0, lh_p, 1.0)), 0.0).astype(lh_p.dtype)
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(lw.dtype, jnp.float32)

    acc = pl.pallas_call(
        _elbo_kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), acc_t),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=np_ * mp_,
        ),
        interpret=_interpret(),
    )(x_pad, lw_p, lh_p, lwl, lhl)
    return acc[0, 0].astype(lw.dtype)


def elbo_data_pallas(x, lw, lh, bn: int = DEFAULT_BN,
                     bm: int = DEFAULT_BM):
    """Drop-in replacement for ops.vb.elbo_data_term."""
    x_pad = pad_matrix(x, bn, bm)
    n, r = lw.shape
    m = lh.shape[1]
    return elbo_data_pallas_padded(x_pad, lw, lh, n=n, m=m, r=r,
                                   bn=bn, bm=bm)


# ---------------------------------------------------------------------
# Fused single-pass kernel: suffstats + ELBO data term
# ---------------------------------------------------------------------
#
# The ELBO data term folds into the sufficient statistics already
# being computed (bilinearity):
#
#   sum_ij x (S/wth)      with  S = (lw log lw)@lh + lw@(lh log lh)
#     = sum_ik swn_ik (lw log lw)_ik + sum_kj shn_kj (lh log lh)_kj
#
# since swn = (x/wth)@lh^T and shn = lw^T@(x/wth).  So the kernel only
# needs THREE GEMMs per X tile (wth, swn, shn) plus the elementwise
# xlog = sum x*log(wth); the rank-space reductions happen outside in
# XLA.  (Round 1's kernel issued five GEMMs per tile; the reference
# recomputes S as two dense n x m GEMMs every sweep,
# src/vbnmf_update.cpp:74-79.)

def fold_dterm(swn, shn, lw, lh, xlog):
    """Complete the ELBO data term from the kernel outputs:
    -sum x*(S/wth - log wth) = -(sum swn*lwlogw + sum shn*lhlogh)
    + xlog."""
    return (-(jnp.sum(swn * (lw * jnp.log(lw)))
              + jnp.sum(shn * (lh * jnp.log(lh)))) + xlog)


def _fused_cm_kernel(mxu_bf16, x_ref, lw_ref, lh_ref, swn_ref,
                     shn_ref, acc_ref):
    """Cell-major fused kernel: grid (nj, ni), gene tile i innermost.

    shn's output block (0, j) is revisited consecutively across i and
    accumulates in VMEM; swn is a full-array output block (constant
    index), VMEM-resident (physical footprint n x 128 lanes — use the
    gene-major variant when n is large); the scalar xlog accumulates
    in SMEM; lw streams per gene tile.

    ``mxu_bf16`` (opt-in, vb_factorize precision='bf16' — now also on
    the mesh path): pre-cast the three GEMMs' operands to bf16 in
    VREGs.  The MXU already truncates f32 operands to 1-pass bf16 on
    TPU, so numerics barely move; the win is halved operand feed
    bandwidth (see ops/pallas/sol.py).
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    acc_t = jnp.promote_types(lw_ref.dtype, jnp.float32)
    lw = lw_ref[...]
    lh = lh_ref[...]
    x = x_ref[...].astype(lw.dtype)
    mt = jnp.bfloat16 if mxu_bf16 else lw.dtype
    lw_m = lw.astype(mt)
    lh_m = lh.astype(mt)
    wth = jnp.dot(lw_m, lh_m, preferred_element_type=acc_t)
    u = _recip_mul(x, wth.astype(lw.dtype)).astype(mt)

    @pl.when((i == 0) & (j == 0))
    def _():
        swn_ref[...] = jnp.zeros_like(swn_ref)
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)
        acc_ref[0, 1] = jnp.zeros((), acc_ref.dtype)

    @pl.when(i == 0)
    def _():
        shn_ref[...] = jnp.zeros_like(shn_ref)

    bn = lw_ref.shape[0]
    swn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
        u, lh_m.T, preferred_element_type=acc_t).astype(swn_ref.dtype)
    shn_ref[...] += jnp.dot(lw_m.T, u, preferred_element_type=acc_t
                            ).astype(shn_ref.dtype)
    _ksum2(acc_ref, jnp.sum(x * jnp.log(wth)))


def _fused_gm_kernel(mxu_bf16, x_ref, lw_ref, lh_ref, swn_ref,
                     shn_ref, acc_ref):
    """Gene-major fused kernel: grid (ni, nj), cell tile j innermost.

    Dual of the cell-major variant for LARGE GENE PANELS: swn's block
    (i, 0) is revisited consecutively across j; shn is the full-array
    VMEM-resident accumulator (physical footprint rp x m — bounded by
    the local cell count, which the mesh shards).  Lets the fused
    backend run at n = 100k+ genes where the cell-major swn residency
    would exceed VMEM.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    acc_t = jnp.promote_types(lw_ref.dtype, jnp.float32)
    lw = lw_ref[...]
    lh = lh_ref[...]
    x = x_ref[...].astype(lw.dtype)
    mt = jnp.bfloat16 if mxu_bf16 else lw.dtype
    lw_m = lw.astype(mt)
    lh_m = lh.astype(mt)
    wth = jnp.dot(lw_m, lh_m, preferred_element_type=acc_t)
    u = _recip_mul(x, wth.astype(lw.dtype)).astype(mt)

    @pl.when((i == 0) & (j == 0))
    def _():
        shn_ref[...] = jnp.zeros_like(shn_ref)
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)
        acc_ref[0, 1] = jnp.zeros((), acc_ref.dtype)

    @pl.when(j == 0)
    def _():
        swn_ref[...] = jnp.zeros_like(swn_ref)

    bm = lh_ref.shape[1]
    swn_ref[...] += jnp.dot(u, lh_m.T, preferred_element_type=acc_t
                            ).astype(swn_ref.dtype)
    shn_ref[:, pl.ds(j * bm, bm)] += jnp.dot(
        lw_m.T, u, preferred_element_type=acc_t).astype(shn_ref.dtype)
    _ksum2(acc_ref, jnp.sum(x * jnp.log(wth)))


def _fused_layout(np_, mp_, rp_, itemsize=4):
    """'cm' (cell-major) unless swn's VMEM residency (n x 128 lanes
    physical) is the binding constraint and the gene-major shn
    residency fits.

    The budget is a quarter of v5e VMEM (128 MB): prefer cm whenever
    it fits — Mosaic compile time for gm's full-array shn block grows
    pathologically with the cell count (measured: 100k cells never
    finished compiling in 25 min; cm compiled in 11 s), so gm is only
    for huge GENE panels where cm's swn residency cannot fit."""
    budget = 32 * 2 ** 20
    cm_resident = np_ * max(rp_, 128) * itemsize
    gm_resident = max(rp_, 8) * mp_ * itemsize
    if cm_resident <= budget or cm_resident <= gm_resident:
        return "cm"
    return "gm"


@functools.partial(jax.jit,
                   static_argnames=("bn", "bm", "layout", "mxu_bf16"))
def fused_pallas_raw(x_pad, lw_p, lh_p, *, bn=DEFAULT_BN,
                     bm=DEFAULT_BM, layout="cm", mxu_bf16=False):
    """X-pass on ALREADY-PADDED factors, returning PADDED outputs.

    For the Pallas-epilogue loop (ops/pallas/epilogue.py), where
    factors stay padded across the whole convergence loop: returns
    (swn_p (np, rp), shn_p (rp, mp), xlog scalar) with no slicing and
    no dterm fold (the epilogue kernels fold it from the padded
    arrays)."""
    np_, mp_ = x_pad.shape
    rp_ = lw_p.shape[1]
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(lw_p.dtype, jnp.float32)

    if layout == "cm":
        kernel = functools.partial(_fused_cm_kernel, bool(mxu_bf16))
        grid = (nj, ni)
        x_idx = lambda j, i: (i, j)      # noqa: E731
        lw_idx = lambda j, i: (i, 0)     # noqa: E731
        lh_idx = lambda j, i: (0, j)     # noqa: E731
        swn_spec = pl.BlockSpec((np_, rp_), lambda j, i: (0, 0),
                                memory_space=pltpu.VMEM)
        shn_spec = pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        acc_idx = lambda j, i: (0, 0)    # noqa: E731
    else:
        kernel = functools.partial(_fused_gm_kernel, bool(mxu_bf16))
        grid = (ni, nj)
        x_idx = lambda i, j: (i, j)      # noqa: E731
        lw_idx = lambda i, j: (i, 0)     # noqa: E731
        lh_idx = lambda i, j: (0, j)     # noqa: E731
        swn_spec = pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        shn_spec = pl.BlockSpec((rp_, mp_), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        acc_idx = lambda i, j: (0, 0)    # noqa: E731

    swn, shn, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bm), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lw_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lh_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            swn_spec,
            shn_spec,
            pl.BlockSpec((1, 2), acc_idx, memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, rp_), acc_t),
            jax.ShapeDtypeStruct((rp_, mp_), acc_t),
            jax.ShapeDtypeStruct((1, 2), acc_t),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=np_ * mp_,
        ),
        interpret=_interpret(),
    )(x_pad, lw_p, lh_p)
    return swn, shn, acc[0, 0]


@functools.partial(jax.jit, static_argnames=("n", "m", "r", "bn", "bm",
                                             "layout", "mxu_bf16"))
def fused_pallas_padded(x_pad, lw, lh, *, n, m, r, bn, bm,
                        layout=None, mxu_bf16=False):
    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    lw_p, lh_p = _pad_factors(lw, lh, np_, mp_, rp_)
    ni, nj = np_ // bn, mp_ // bm
    acc_t = jnp.promote_types(lw.dtype, jnp.float32)
    if layout is None:
        layout = _fused_layout(np_, mp_, rp_)

    if layout == "cm":
        kernel = functools.partial(_fused_cm_kernel, bool(mxu_bf16))
        grid = (nj, ni)
        x_idx = lambda j, i: (i, j)      # noqa: E731
        lw_idx = lambda j, i: (i, 0)     # noqa: E731
        lh_idx = lambda j, i: (0, j)     # noqa: E731
        swn_spec = pl.BlockSpec((np_, rp_), lambda j, i: (0, 0),
                                memory_space=pltpu.VMEM)
        shn_spec = pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                                memory_space=pltpu.VMEM)
        acc_idx = lambda j, i: (0, 0)    # noqa: E731
    else:
        kernel = functools.partial(_fused_gm_kernel, bool(mxu_bf16))
        grid = (ni, nj)
        x_idx = lambda i, j: (i, j)      # noqa: E731
        lw_idx = lambda i, j: (i, 0)     # noqa: E731
        lh_idx = lambda i, j: (0, j)     # noqa: E731
        swn_spec = pl.BlockSpec((bn, rp_), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        shn_spec = pl.BlockSpec((rp_, mp_), lambda i, j: (0, 0),
                                memory_space=pltpu.VMEM)
        acc_idx = lambda i, j: (0, 0)    # noqa: E731

    swn, shn, acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bm), x_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lw_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lh_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            swn_spec,
            shn_spec,
            pl.BlockSpec((1, 2), acc_idx, memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, rp_), acc_t),
            jax.ShapeDtypeStruct((rp_, mp_), acc_t),
            jax.ShapeDtypeStruct((1, 2), acc_t),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * x_pad.dtype.itemsize,
            transcendentals=np_ * mp_,
        ),
        interpret=_interpret(),
    )(x_pad, lw_p, lh_p)

    swn = swn[:n, :r].astype(lw.dtype)
    shn = shn[:r, :m].astype(lh.dtype)
    dterm = fold_dterm(swn, shn, lw, lh, acc[0, 0].astype(lw.dtype))
    return swn, shn, dterm


def fused_pallas(x, lw, lh, bn: int = DEFAULT_BN, bm: int = DEFAULT_BM,
                 layout=None, mxu_bf16=False):
    """Single-pass fused backend for ops.vb.vb_run(fused=...): returns
    (swn, shn, dterm) — suffstat numerators (sw = lw*swn, sh = lh*shn)
    plus the ELBO data term for the SAME (lw, lh), reading X once with
    three GEMMs per tile.  ``mxu_bf16``: pre-cast GEMM operands to
    bf16 (the precision='bf16' opt-in, available on the mesh path
    through parallel.sharded.make_fused_sharded)."""
    n, r = lw.shape
    m = lh.shape[1]
    x_pad = pad_matrix(x, bn, bm)
    return fused_pallas_padded(x_pad, lw, lh, n=n, m=m, r=r,
                               bn=bn, bm=bm, layout=layout,
                               mxu_bf16=mxu_bf16)


def make_fused_backend(bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """Fused kernel for vb_run/vb_factorize's single-pass path.
    Pre-pad X with :func:`pad_matrix` (same bn/bm) to avoid a
    per-sweep pad."""
    def fused(x, lw, lh):
        return fused_pallas(x, lw, lh, bn=bn, bm=bm)

    return fused


def make_pallas_backend(bn: int = DEFAULT_BN, bm: int = DEFAULT_BM):
    """(suffstats, data_term) pair for vb_factorize(suffstats=...,
    data_term=...).  Pre-pad X with :func:`pad_matrix` (same bn/bm) to
    avoid a per-sweep pad."""
    def pallas_suffstats(x, lw, lh):
        return suffstats_pallas(x, lw, lh, bn=bn, bm=bm)

    def pallas_data_term(x, lw, lh):
        return elbo_data_pallas(x, lw, lh, bn=bn, bm=bm)

    return pallas_suffstats, pallas_data_term
