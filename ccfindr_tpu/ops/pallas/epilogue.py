"""Pallas gamma-posterior epilogue: the VB sweep WITHOUT XLA round-trips.

Round-2 profiling showed the eager XLA posterior update
(ops/vb.py posterior_update: digamma/exp/mul chains over alw (n,r) and
alh (r,m) with separate HBM materializations, plus 4 standalone
reductions feeding hyper_update) costs ~110 us of a ~280 us production
sweep at the north-star shape — more than half the non-kernel time.
These two kernels compute the ENTIRE posterior update (reference math
src/vbnmf_update.cpp:38-65) in one pass over each factor:

* :func:`_w_epilogue_kernel` — per gene tile: alw = aw + lw*swn,
  ew/lw'/dw, the U2 ELBO partial, the dterm fold partial
  sum(swn * lw log lw), colsum(ew) (feeds the H side), and the scalar
  sums (sum ew, sum log lw') that hyper_update needs.
* :func:`_h_epilogue_kernel` — cell-tile dual, consuming colsum(ew)
  and emitting rowsum(eh) for the NEXT sweep's W side.

digamma/lgamma have no Mosaic lowering; the kernels use
ops.vb.digamma_approx / gammaln_approx (recurrence + Bernoulli
asymptotic series, < 1e-12 rel err in f64 — tests/test_vb_kernel.py).

Factors stay PADDED throughout the convergence loop (the same padding
contract as vb_kernels.py: W rows pad 1 / rank cols pad 0, H rank rows
pad 0 / cell cols pad 1), so the per-sweep jnp.pad of the factors
disappears too.  Masking semantics mirror ops.vb.posterior_update:
``rank_mask`` marks live components of a batched rank sweep (masked
components pinned at fudge, exactly the eager path), ``cell_mask``
marks real cells under mesh padding; all reductions make padding and
masked entries contribute exactly nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.special import gammaln

from ..vb import (Hyper, VBRunResult, VBState, digamma_gammaln_both,
                  hyper_update)
from .vb_kernels import (DEFAULT_BN, DEFAULT_BM, _interpret,
                         _pad_factors, _round_up, fused_pallas_raw)


def _epi_block(dim, base, bytes_per_row, budget):
    """Largest multiple of ``base`` dividing ``dim`` whose block stays
    under ``budget`` bytes (physical, lane-padded)."""
    best = min(base, dim)
    k = 1
    while True:
        b = k * base
        if b > dim or b * bytes_per_row > budget:
            break
        if dim % b == 0:
            best = b
        k += 1
    return best


def _row0(vec, rows, lanes, dtype):
    """(lanes,) vector -> (rows, lanes) block with vec in row 0
    (iota mask, not .at[].set — scatter has no Mosaic lowering)."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    return jnp.where(rowi == 0, vec[None, :].astype(dtype),
                     jnp.zeros((), dtype))


def _w_epilogue_kernel(n, r, bn, swn_ref, lw_ref, ehs_ref, sc_ref,
                       ew_ref, lwn_ref, dw_ref, csum_ref, scal_ref):
    """Zones along columns: live component (col < r_live, the dynamic
    per-instance rank) -> computed; rank-masked (r_live <= col < r) ->
    lw pinned at fudge (eager posterior_update rank_mask semantics,
    PREFIX masks only — the drivers pad ranks at the end); pallas pad
    (col >= r) -> 0.  Rows >= n keep the X-kernel contract (1 where
    col < r else 0).  Scalar counts ride in SMEM — Mosaic has no
    lowering for inserting a minor dim on sub-32-bit (bool) values,
    so 1-D mask vectors cannot broadcast inside the kernel."""
    i = pl.program_id(0)
    aw = sc_ref[0, 0]
    bw = sc_ref[0, 1]
    fudge = sc_ref[0, 2]
    r_live = sc_ref[0, 3]
    swn = swn_ref[...]
    lw = lw_ref[...]
    rp = lw.shape[1]

    row = i * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, rp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, rp), 1)
    live = (row < n) & (col.astype(r_live.dtype) < r_live)
    inr = col < r

    bew = 1.0 / (aw / bw + ehs_ref[0, :])          # (rp,) per-column
    log_bew = jnp.log(bew)
    alw = aw + lw * swn
    psi, lgam = digamma_gammaln_both(alw)
    ew = jnp.where(live, alw * bew[None, :], 0.0)
    lwn_raw = jnp.exp(psi) * bew[None, :]
    lwn = jnp.where(live, jnp.maximum(lwn_raw, fudge),
                    jnp.where(inr & (row < n), fudge,
                              jnp.where(inr, 1.0, 0.0)))
    dw = jnp.where(live, alw * bew[None, :] ** 2, 0.0)

    ew_ref[...] = ew.astype(ew_ref.dtype)
    lwn_ref[...] = lwn.astype(lwn_ref.dtype)
    dw_ref[...] = dw.astype(dw_ref.dtype)

    @pl.when(i == 0)
    def _():
        csum_ref[...] = jnp.zeros_like(csum_ref)
        for k in range(4):              # SMEM stores must be scalar
            scal_ref[0, k] = jnp.zeros((), scal_ref.dtype)

    csum_ref[...] += _row0(jnp.sum(ew, axis=0), 8, rp,
                           csum_ref.dtype)

    u2 = jnp.where(live, -(aw / bw) * ew
                   + alw * (1.0 + log_bew[None, :]) + lgam, 0.0)
    # log(max(e^psi * bew, fudge)) without a second log over the tile
    logl = jnp.where(live & (lwn_raw > fudge),
                     psi + log_bew[None, :],
                     jnp.where(live, jnp.log(fudge), 0.0))
    dtermw = jnp.where(live,
                       swn * lw * jnp.log(jnp.where(live, lw, 1.0)),
                       0.0)
    scal_ref[0, 0] += jnp.sum(u2).astype(scal_ref.dtype)
    scal_ref[0, 1] += jnp.sum(ew).astype(scal_ref.dtype)
    scal_ref[0, 2] += jnp.sum(logl).astype(scal_ref.dtype)
    scal_ref[0, 3] += jnp.sum(dtermw).astype(scal_ref.dtype)


def _h_epilogue_kernel(m, m_live, r, bm, shn_ref, lh_ref, cew_ref,
                       sc_ref, eh_ref, lhn_ref, dh_ref, rsum_ref,
                       scal_ref):
    """Zones: live (row < r_live, col < m_live) -> computed; rank- or
    cell-masked inside [0,r) x [0,m) -> lh pinned at fudge (PREFIX
    masks only — mesh cell padding and batched rank padding are both
    suffixes); pallas pad (row >= r -> 0; col >= m, row < r -> 1)."""
    j = pl.program_id(0)
    ah = sc_ref[0, 0]
    bh = sc_ref[0, 1]
    fudge = sc_ref[0, 2]
    r_live = sc_ref[0, 3]
    shn = shn_ref[...]
    lh = lh_ref[...]
    rp = lh.shape[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (rp, bm), 0)
    col = j * bm + jax.lax.broadcasted_iota(jnp.int32, (rp, bm), 1)
    live = ((row.astype(r_live.dtype) < r_live) & (col < m_live)
            & (col < m))
    inm = (row < r) & (col < m)

    beh = 1.0 / (ah / bh + cew_ref[0, :])          # (rp,) per-row
    log_beh = jnp.log(beh)
    alh = ah + lh * shn
    psi, lgam = digamma_gammaln_both(alh)
    eh = jnp.where(live, alh * beh[:, None], 0.0)
    lhn_raw = jnp.exp(psi) * beh[:, None]
    lhn = jnp.where(live, jnp.maximum(lhn_raw, fudge),
                    jnp.where(inm, fudge,
                              jnp.where(row < r, 1.0, 0.0)))
    dh = jnp.where(live, alh * beh[:, None] ** 2, 0.0)

    eh_ref[...] = eh.astype(eh_ref.dtype)
    lhn_ref[...] = lhn.astype(lhn_ref.dtype)
    dh_ref[...] = dh.astype(dh_ref.dtype)

    @pl.when(j == 0)
    def _():
        rsum_ref[...] = jnp.zeros_like(rsum_ref)
        for k in range(4):              # SMEM stores must be scalar
            scal_ref[0, k] = jnp.zeros((), scal_ref.dtype)

    rsum_ref[...] += _row0(jnp.sum(eh, axis=1), 8, rp,
                           rsum_ref.dtype)

    u3 = jnp.where(live, -(ah / bh) * eh
                   + alh * (1.0 + log_beh[:, None]) + lgam, 0.0)
    logl = jnp.where(live & (lhn_raw > fudge),
                     psi + log_beh[:, None],
                     jnp.where(live, jnp.log(fudge), 0.0))
    dtermh = jnp.where(live,
                       shn * lh * jnp.log(jnp.where(live, lh, 1.0)),
                       0.0)
    scal_ref[0, 0] += jnp.sum(u3).astype(scal_ref.dtype)
    scal_ref[0, 1] += jnp.sum(eh).astype(scal_ref.dtype)
    scal_ref[0, 2] += jnp.sum(logl).astype(scal_ref.dtype)
    scal_ref[0, 3] += jnp.sum(dtermh).astype(scal_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n", "m", "r", "bn", "bm",
                                    "m_live"))
def posterior_update_pallas(swn_p, shn_p, lw_p, lh_p, ehs, hyper_vec,
                            fudge, *, n, m, r, bn=DEFAULT_BN,
                            bm=DEFAULT_BM, r_live=None, m_live=None):
    """Full gamma-posterior update on PADDED factors.

    Inputs: padded X-kernel outputs swn_p (np, rp) / shn_p (rp, mp),
    padded factors lw_p/lh_p, ``ehs`` = rowsum of the current eh as an
    (8, rp) block (row 0), hyper_vec = [aw, bw, ah, bh] (dynamic),
    fudge scalar.  ``r_live`` (dynamic scalar, default r) is the live
    component count of a batched rank sweep (prefix semantics);
    ``m_live`` (static, default m) the real cell count under mesh
    padding; ``n``/``m``/``r`` are the static extents of the
    non-pallas-padded region.

    Returns dict with padded new factors (ew, lw, dw, eh, lh, dh),
    ``csum``/``rsum`` (8, rp) blocks (colsum of new ew / rowsum of new
    eh), and the scalar sums: u2, u3 (ELBO partials over live
    entries), sum_ew, sum_log_lw, sum_eh, sum_log_lh (hyper means
    numerators), dterm_w, dterm_h (the deferred-ELBO fold partials
    sum(swn*lw*log lw), sum(shn*lh*log lh) for the INPUT lw/lh).
    """
    np_, rp_ = swn_p.shape
    mp_ = shn_p.shape[1]
    dt = lw_p.dtype
    # epilogue block sizes are independent of the X-pass tiles: fewer,
    # larger blocks cut grid-step overhead (the H tile is physically
    # tiny — rp_ rows); W blocks are (bn, rp_<=128-lane-padded), so a
    # conservative scoped-VMEM budget caps them (Mosaic scoped limit
    # is 16 MB; bn=4096 measured OOM)
    bn = _epi_block(np_, bn, 128 * dt.itemsize, 2 ** 19)
    bm = _epi_block(mp_, bm, rp_ * dt.itemsize, 2 ** 22)
    ni, nj = np_ // bn, mp_ // bm
    if r_live is None:
        r_live = jnp.asarray(r, dt)
    if m_live is None:
        m_live = m

    sc_w = jnp.stack([hyper_vec[0], hyper_vec[1], fudge,
                      jnp.asarray(r_live, dt)])[None, :].astype(dt)
    sc_h = jnp.stack([hyper_vec[2], hyper_vec[3], fudge,
                      jnp.asarray(r_live, dt)])[None, :].astype(dt)

    ew_p, lwn_p, dw_p, csum, scal_w = pl.pallas_call(
        functools.partial(_w_epilogue_kernel, n, r, bn),
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((bn, rp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, rp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rp_), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, rp_), dt),
            jax.ShapeDtypeStruct((np_, rp_), dt),
            jax.ShapeDtypeStruct((np_, rp_), dt),
            jax.ShapeDtypeStruct((8, rp_), dt),
            jax.ShapeDtypeStruct((1, 4), dt),
        ],
        interpret=_interpret(),
    )(swn_p, lw_p, ehs, sc_w)

    eh_p, lhn_p, dh_p, rsum, scal_h = pl.pallas_call(
        functools.partial(_h_epilogue_kernel, m, m_live, r, bm),
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((rp_, bm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rp_), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((rp_, bm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rp_), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp_, mp_), dt),
            jax.ShapeDtypeStruct((rp_, mp_), dt),
            jax.ShapeDtypeStruct((rp_, mp_), dt),
            jax.ShapeDtypeStruct((8, rp_), dt),
            jax.ShapeDtypeStruct((1, 4), dt),
        ],
        interpret=_interpret(),
    )(shn_p, lh_p, csum, sc_h)

    return dict(ew=ew_p, lw=lwn_p, dw=dw_p,
                eh=eh_p, lh=lhn_p, dh=dh_p,
                csum=csum, rsum=rsum,
                u2=scal_w[0, 0], sum_ew=scal_w[0, 1],
                sum_log_lw=scal_w[0, 2], dterm_w=scal_w[0, 3],
                u3=scal_h[0, 0], sum_eh=scal_h[0, 1],
                sum_log_lh=scal_h[0, 2], dterm_h=scal_h[0, 3])


# ---------------------------------------------------------------------
# All-Pallas convergence loop
# ---------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "hyper_mask", "n0", "dn", "bn", "bm", "layout", "m_true"))
def vb_run_epi(x_pad, state0: VBState, hyper0: Hyper, *,
               itmax: int = 10000, tol: float = 1e-5, fudge=None,
               hyper_mask=(True,) * 4, n0: int = 10, dn: int = 1,
               bn: int = DEFAULT_BN, bm: int = DEFAULT_BM,
               layout: str = "cm", cell_mask=None, m_true=None,
               rank_mask=None, r_true=None, it0=1,
               lk0_init=None) -> VBRunResult:
    """vb_run with the ENTIRE sweep in Pallas: the deferred-ELBO fused
    loop of ops.vb._vb_run_fused, where the gamma-posterior update and
    the hyper-update means are kernel byproducts instead of eager XLA
    (the ~110 us/sweep epilogue measured in round 2).

    Factors live PADDED for the whole loop; hyper_update receives its
    four means from the epilogue scalars, so the only non-Pallas work
    per sweep is the scalar Newton chain and the convergence logic.
    Signature mirrors vb_run (rank_mask/r_true for batched rank
    sweeps, cell_mask/m_true for mesh cell padding, it0/lk0_init for
    exact resume).

    Same math as vb_run(fused=...): identical ELBO sequence up to the
    digamma/lgamma implementation (digamma_approx/gammaln_approx,
    < 1e-12 rel in f64) and tile-order of the scalar reductions.
    Reference math: src/vbnmf_update.cpp:38-90, driver loop
    R/bayesian.R:337-352.
    """
    n, r = state0.lw.shape
    m = m_true if m_true is not None else state0.lh.shape[1]
    m_arr = state0.lh.shape[1]          # mesh-padded cell extent
    ref_t = state0.lw.dtype
    if fudge is None:
        fudge = jnp.finfo(ref_t).eps
    fudge = jnp.asarray(fudge, ref_t)
    tol = jnp.asarray(tol, ref_t)
    if lk0_init is None:
        lk0_init = 0.0
    r_eff = r_true if r_true is not None else r

    np_, mp_ = x_pad.shape
    rp_ = _round_up(max(r, 8), 8)
    lgx = jnp.sum(gammaln(x_pad.astype(ref_t) + 1.0))

    # initial-state masking, exactly as _vb_run_fused
    if rank_mask is not None:
        mw = rank_mask[None, :]
        mh = rank_mask[:, None]
        state0 = state0._replace(
            ew=state0.ew * mw, dw=state0.dw * mw,
            lw=jnp.where(mw > 0, state0.lw, fudge),
            eh=state0.eh * mh, dh=state0.dh * mh,
            lh=jnp.where(mh > 0, state0.lh, fudge))
    if cell_mask is not None:
        state0 = state0._replace(
            eh=state0.eh * cell_mask, dh=state0.dh * cell_mask,
            lh=jnp.where(cell_mask > 0, state0.lh, fudge))

    def pad_w(a):
        return jnp.pad(a, ((0, np_ - n), (0, rp_ - r)))

    def pad_h(a):
        return jnp.pad(a, ((0, rp_ - r), (0, mp_ - m_arr)))

    lw_p, lh_p = _pad_factors(state0.lw, state0.lh, np_, mp_, rp_)
    ew_p = pad_w(state0.ew)
    dw_p = pad_w(state0.dw)
    eh_p = pad_h(state0.eh)
    dh_p = pad_h(state0.dh)
    ehs = jnp.zeros((8, rp_), ref_t).at[0, :r].set(
        jnp.sum(state0.eh, axis=1))

    # prefix-mask scalars for the kernels (drivers pad ranks and
    # cells as suffixes; general non-prefix masks are not supported
    # by the epi path — use vb_run(fused=...) for those)
    r_live = (jnp.asarray(r_true, ref_t) if rank_mask is not None
              else None)

    nr = n * r_eff
    rm = r_eff * m

    def cond(carry):
        it = carry[0]
        done = carry[-2]
        return (~done) & (it <= itmax + 1)

    def body(carry):
        (it, lw_p, lh_p, ew_p, eh_p, dw_p, dh_p, ehs, hyper, lk0,
         pending, lkh, done, hfail) = carry
        aw, bw, ah, bh = hyper

        swn_p, shn_p, xlog = fused_pallas_raw(x_pad, lw_p, lh_p,
                                              bn=bn, bm=bm,
                                              layout=layout)
        out = posterior_update_pallas(
            swn_p.astype(ref_t), shn_p.astype(ref_t), lw_p, lh_p, ehs,
            jnp.stack([aw, bw, ah, bh]).astype(ref_t), fudge,
            n=n, m=m_arr, r=r, bn=bn, bm=bm, r_live=r_live,
            m_live=m)

        # complete sweep it-1's ELBO (deferred data term)
        itp = it - 1
        dterm = -(out["dterm_w"] + out["dterm_h"]) \
            + xlog.astype(ref_t)
        lkh_prev = (pending + dterm) / (float(n) * float(m))
        valid = itp >= it_start
        nan_stop = jnp.isnan(lkh_prev) & valid
        conv = (valid & (itp > 1) & (itp > n0) & (lkh_prev >= lk0)
                & (jnp.abs(1.0 - lkh_prev / lk0) < tol))
        stop = nan_stop | conv
        lk0 = jnp.where(valid, jnp.where(stop, lk0, lkh_prev), lk0)
        lkh = jnp.where(valid, lkh_prev, lkh)

        # sweep `it` (selected away when stopping or past itmax)
        do_sweep = (~stop) & (it <= itmax)
        u1 = -jnp.dot(out["csum"][0], out["rsum"][0]) - lgx
        const_w = nr * (aw * jnp.log(aw / bw) - gammaln(aw))
        const_h = rm * (ah * jnp.log(ah / bh) - gammaln(ah))
        new_pending = u1 + out["u2"] + const_w + out["u3"] + const_h

        do_hyper = do_sweep & (it > n0) & (it % dn == 0)
        new_hyper, failed = hyper_update(
            hyper_mask, None, hyper,
            means=(out["sum_log_lw"] / nr, out["sum_ew"] / nr,
                   out["sum_log_lh"] / rm, out["sum_eh"] / rm))
        hyper = Hyper(*(jnp.where(do_hyper, new, old)
                        for new, old in zip(new_hyper, hyper)))
        hfail = hfail | (do_hyper & failed)

        sel = lambda new, old: jnp.where(do_sweep, new, old)  # noqa
        lw_p = sel(out["lw"], lw_p)
        lh_p = sel(out["lh"], lh_p)
        ew_p = sel(out["ew"], ew_p)
        eh_p = sel(out["eh"], eh_p)
        dw_p = sel(out["dw"], dw_p)
        dh_p = sel(out["dh"], dh_p)
        ehs = sel(out["rsum"], ehs)
        pending = jnp.where(do_sweep, new_pending, pending)
        # carry the STOP flag only; the cond's it bound still exits,
        # and the result's `done` reports true convergence (see
        # ops.vb.VBRunResult)
        done = stop
        return (it + 1, lw_p, lh_p, ew_p, eh_p, dw_p, dh_p, ehs,
                hyper, lk0, pending, lkh, done, hfail)

    it_start = jnp.asarray(it0)
    carry = (it_start, lw_p, lh_p, ew_p, eh_p, dw_p, dh_p, ehs,
             hyper0, jnp.asarray(lk0_init, ref_t),
             jnp.asarray(0.0, ref_t), state0.lkh,
             jnp.asarray(False), jnp.asarray(False))
    (it, lw_p, lh_p, ew_p, eh_p, dw_p, dh_p, ehs, hyper, lk0,
     _, lkh, done, hfail) = jax.lax.while_loop(cond, body, carry)

    state = VBState(ew=ew_p[:n, :r], eh=eh_p[:r, :m_arr],
                    lw=lw_p[:n, :r], lh=lh_p[:r, :m_arr],
                    dw=dw_p[:n, :r], dh=dh_p[:r, :m_arr], lkh=lkh)
    return VBRunResult(state=state, hyper=hyper, lml=lk0,
                       n_iter=it - 2, hyper_failed=hfail, done=done)
