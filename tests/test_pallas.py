"""Differential tests: Pallas fused kernels vs dense XLA path
(the rebuild's analog of the reference's useC=TRUE/FALSE pair).
Run in interpreter mode on the CPU test mesh; identical code compiles
on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.pallas import (suffstats_pallas, elbo_data_pallas,
                                    pad_matrix)


def _problem(n, m, r, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.poisson(2.0, size=(n, m)).astype(np.float64)
    lw = rng.gamma(1.0, 1.0, size=(n, r))
    lh = rng.gamma(1.0, 1.0, size=(r, m))
    return jnp.asarray(x), jnp.asarray(lw), jnp.asarray(lh)


@pytest.mark.parametrize("shape", [(16, 24, 3), (32, 16, 5)])
def test_suffstats_pallas_matches_dense(shape):
    n, m, r = shape
    x, lw, lh = _problem(n, m, r)
    sw_d, sh_d = vb_ops.suffstats_dense(x, lw, lh)
    sw_p, sh_p = suffstats_pallas(x, lw, lh, bn=8, bm=128)
    np.testing.assert_allclose(np.asarray(sw_p), np.asarray(sw_d),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sh_p), np.asarray(sh_d),
                               rtol=1e-10)


def test_suffstats_pallas_padding_invariance():
    """Pre-padded X gives identical results (padding contract)."""
    n, m, r = 20, 40, 4
    x, lw, lh = _problem(n, m, r, seed=1)
    sw1, sh1 = suffstats_pallas(x, lw, lh, bn=8, bm=128)
    x_pad = pad_matrix(x, 8, 128)
    sw2, sh2 = suffstats_pallas(x_pad, lw, lh, bn=8, bm=128)
    np.testing.assert_allclose(np.asarray(sw1), np.asarray(sw2),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sh1), np.asarray(sh2),
                               rtol=1e-12)


def test_elbo_data_pallas_matches_dense():
    n, m, r = 24, 48, 3
    x, lw, lh = _problem(n, m, r, seed=2)
    # lw/lh must be positive (clamped at fudge in the real sweep)
    ref = vb_ops.elbo_data_term(x, lw, lh)
    out = elbo_data_pallas(x, lw, lh, bn=8, bm=128)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-10)


def test_vb_sweep_with_pallas_backend_matches():
    from ccfindr_tpu.ops.vb import Hyper, VBState

    n, m, r = 16, 32, 3
    x, lw, lh = _problem(n, m, r, seed=3)
    hyper = Hyper(*(jnp.asarray(v) for v in (1.0, 1.0, 1.0, 1.0)))
    st = VBState(ew=lw, eh=lh, lw=lw, lh=lh,
                 dw=jnp.zeros_like(lw), dh=jnp.zeros_like(lh),
                 lkh=jnp.asarray(-np.inf))
    eps = np.finfo(np.float64).eps
    lgx = jnp.sum(jax.scipy.special.gammaln(x + 1.0))

    dense = vb_ops.vb_sweep(x, st, hyper, eps, lgx)

    def ss(x_, lw_, lh_):
        return suffstats_pallas(x_, lw_, lh_, bn=8, bm=128)

    def dt(x_, lw_, lh_):
        return elbo_data_pallas(x_, lw_, lh_, bn=8, bm=128)

    fused = vb_ops.vb_sweep(x, st, hyper, eps, lgx,
                            suffstats=ss, data_term=dt)
    for f in ("ew", "eh", "lw", "lh"):
        np.testing.assert_allclose(np.asarray(getattr(fused, f)),
                                   np.asarray(getattr(dense, f)),
                                   rtol=1e-9, err_msg=f)
    np.testing.assert_allclose(float(fused.lkh), float(dense.lkh),
                               rtol=1e-9)


def test_fused_pallas_matches_twopass_kernels():
    """The single-pass fused kernel returns exactly the 2-pass kernels'
    outputs: swn/shn numerators + the ELBO data term."""
    from ccfindr_tpu.ops.pallas import fused_pallas

    n, m, r = 24, 40, 5
    x, lw, lh = _problem(n, m, r, seed=4)
    swn, shn, dterm = fused_pallas(x, lw, lh, bn=8, bm=128)
    sw2, sh2 = suffstats_pallas(x, lw, lh, bn=8, bm=128)
    d2 = elbo_data_pallas(x, lw, lh, bn=8, bm=128)
    np.testing.assert_allclose(np.asarray(lw * swn), np.asarray(sw2),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lh * shn), np.asarray(sh2),
                               rtol=1e-12)
    np.testing.assert_allclose(float(dterm), float(d2), rtol=1e-12)


def test_fused_pallas_matches_fused_dense():
    from ccfindr_tpu.ops.pallas import fused_pallas

    n, m, r = 16, 48, 3
    x, lw, lh = _problem(n, m, r, seed=5)
    swn_d, shn_d, dt_d = vb_ops.fused_dense(x, lw, lh)
    swn_p, shn_p, dt_p = fused_pallas(x, lw, lh, bn=8, bm=128)
    np.testing.assert_allclose(np.asarray(swn_p), np.asarray(swn_d),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(shn_p), np.asarray(shn_d),
                               rtol=1e-9)
    np.testing.assert_allclose(float(dt_p), float(dt_d), rtol=1e-9)


def test_fused_pallas_padding_invariance():
    from ccfindr_tpu.ops.pallas import fused_pallas

    n, m, r = 20, 40, 4
    x, lw, lh = _problem(n, m, r, seed=6)
    out1 = fused_pallas(x, lw, lh, bn=8, bm=128)
    out2 = fused_pallas(pad_matrix(x, 8, 128), lw, lh, bn=8, bm=128)
    for a, b in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12)


def test_vb_run_fused_matches_eager_exactly():
    """The deferred-ELBO loop reproduces the eager two-pass loop
    bit-for-bit when both use the same (dense, HIGHEST) GEMMs:
    same n_iter, lml, hyper, and final state."""
    from ccfindr_tpu.ops.vb import Hyper

    n, m, r = 40, 60, 4
    rng = np.random.default_rng(7)
    w0 = rng.gamma(2.0, 1.0, (n, r))
    h0 = rng.gamma(2.0, 1.0, (r, m))
    x = jnp.asarray(rng.poisson(w0 @ h0), jnp.float64)
    key = jax.random.PRNGKey(0)
    h1 = Hyper(aw=1.0, bw=1.0, ah=1.0, bh=1.0)
    st = vb_ops.vb_init_random(key, n, m, r, h1, jnp.float64)
    hy = Hyper(*(jnp.asarray(v, jnp.float64)
                 for v in (1.0, 1.0, 1.0, 1.0)))
    for kw in (dict(itmax=300, tol=1e-6, hyper_mask=(True,) * 4,
                    n0=10, dn=1),
               # itmax-exhaustion path
               dict(itmax=7, tol=1e-12, hyper_mask=(True,) * 4,
                    n0=3, dn=2)):
        eager = vb_ops.vb_run(x, st, hy, **kw)
        fused = vb_ops.vb_run(x, st, hy, fused=vb_ops.fused_dense, **kw)
        assert int(eager.n_iter) == int(fused.n_iter)
        assert float(eager.lml) == float(fused.lml)
        assert float(eager.state.lkh) == float(fused.state.lkh)
        for a, b in zip(eager.hyper, fused.hyper):
            assert float(a) == float(b)
        np.testing.assert_array_equal(np.asarray(eager.state.ew),
                                      np.asarray(fused.state.ew))
        np.testing.assert_array_equal(np.asarray(eager.state.eh),
                                      np.asarray(fused.state.eh))


def test_vb_run_fused_rank_and_cell_masks():
    """Fused loop under rank/cell padding masks == eager loop."""
    from ccfindr_tpu.ops.vb import Hyper

    n, m, r, rpad, mpad = 24, 30, 3, 5, 36
    rng = np.random.default_rng(8)
    w0 = rng.gamma(2.0, 1.0, (n, r))
    h0 = rng.gamma(2.0, 1.0, (r, m))
    x = np.asarray(rng.poisson(w0 @ h0), np.float64)
    xpad = jnp.asarray(np.pad(x, ((0, 0), (0, mpad - m))))
    cell_mask = jnp.asarray((np.arange(mpad) < m).astype(np.float64))
    rank_mask = jnp.asarray((np.arange(rpad) < r).astype(np.float64))
    key = jax.random.PRNGKey(1)
    h1 = Hyper(aw=1.0, bw=1.0, ah=1.0, bh=1.0)
    st = vb_ops.vb_init_random(key, n, mpad, rpad, h1, jnp.float64)
    hy = Hyper(*(jnp.asarray(v, jnp.float64)
                 for v in (1.0, 1.0, 1.0, 1.0)))
    kw = dict(itmax=150, tol=1e-6, hyper_mask=(True,) * 4, n0=10, dn=1,
              cell_mask=cell_mask, m_true=m, rank_mask=rank_mask,
              r_true=float(r))
    eager = vb_ops.vb_run(xpad, st, hy, **kw)
    fused = vb_ops.vb_run(xpad, st, hy, fused=vb_ops.fused_dense, **kw)
    assert int(eager.n_iter) == int(fused.n_iter)
    assert float(eager.lml) == float(fused.lml)
    np.testing.assert_array_equal(np.asarray(eager.state.ew),
                                  np.asarray(fused.state.ew))


# ---------------------------------------------------------------------
# Pallas posterior epilogue (ops/pallas/epilogue.py)
# ---------------------------------------------------------------------

def test_posterior_update_pallas_matches_eager():
    """The W/H epilogue kernels reproduce ops.vb.posterior_update on
    padded arrays: factors, the U2/U3 ELBO partials, the dterm fold
    partials, and the hyper-update mean numerators."""
    from ccfindr_tpu.ops.pallas import epilogue as ep
    from ccfindr_tpu.ops.pallas import vb_kernels as pk
    from ccfindr_tpu.ops.vb import Hyper, VBState

    n, m, r = 20, 27, 3
    bn, bm = 8, 8
    x, lw, lh = _problem(n, m, r, seed=3)
    st = VBState(ew=lw, eh=lh, lw=lw, lh=lh, dw=jnp.zeros_like(lw),
                 dh=jnp.zeros_like(lh),
                 lkh=jnp.asarray(-jnp.inf, lw.dtype))
    hyper = Hyper(*(jnp.asarray(v, lw.dtype)
                    for v in (0.7, 1.3, 1.1, 0.9)))
    fudge = jnp.asarray(np.finfo(np.float64).eps, lw.dtype)

    # eager oracle
    swn, shn, dterm = vb_ops.fused_dense(x, lw, lh)
    new, pending = vb_ops.posterior_update(
        lw * swn, lh * shn, st, hyper, fudge, jnp.asarray(0.0))

    # pallas epilogue on padded arrays
    xp = pk.pad_matrix(x, bn, bm)
    np_, mp_ = xp.shape
    rp_ = 8
    lw_p, lh_p = pk._pad_factors(lw, lh, np_, mp_, rp_)
    swn_p, shn_p, xlog = pk.fused_pallas_raw(xp, lw_p, lh_p,
                                             bn=bn, bm=bm)
    ehs = jnp.zeros((8, rp_), lw.dtype).at[0, :r].set(
        jnp.sum(st.eh, axis=1))
    out = ep.posterior_update_pallas(
        swn_p, shn_p, lw_p, lh_p, ehs,
        jnp.stack(list(hyper)), fudge, n=n, m=m, r=r, bn=bn, bm=bm)

    for f in ["ew", "eh", "lw", "lh", "dw", "dh"]:
        got = np.asarray(out[f])
        got = got[:n, :r] if f in ("ew", "lw", "dw") else got[:r, :m]
        np.testing.assert_allclose(got, np.asarray(getattr(new, f)),
                                   rtol=1e-10, err_msg=f)
    # ELBO partials: pending = u1 + u2 + u3 with u1 from csum/rsum
    u1 = -float(jnp.dot(out["csum"][0], out["rsum"][0]))
    aw, bw, ah, bh = (float(v) for v in hyper)
    from scipy.special import gammaln as sgl
    cw = n * r * (aw * np.log(aw / bw) - sgl(aw))
    ch = r * m * (ah * np.log(ah / bh) - sgl(ah))
    got_pending = u1 + float(out["u2"]) + cw + float(out["u3"]) + ch
    np.testing.assert_allclose(got_pending, float(pending), rtol=1e-10)
    # deferred-ELBO fold partials reproduce fold_dterm
    from ccfindr_tpu.ops.pallas.vb_kernels import fold_dterm
    want_fold = float(fold_dterm(swn_p[:n, :r], shn_p[:r, :m], lw, lh,
                                 xlog))
    got_fold = float(-(out["dterm_w"] + out["dterm_h"]) + xlog)
    np.testing.assert_allclose(got_fold, want_fold, rtol=1e-10)
    # hyper means
    np.testing.assert_allclose(float(out["sum_ew"]) / (n * r),
                               float(jnp.mean(new.ew)), rtol=1e-10)
    np.testing.assert_allclose(float(out["sum_log_lw"]) / (n * r),
                               float(jnp.mean(jnp.log(new.lw))),
                               rtol=1e-10)
    np.testing.assert_allclose(float(out["sum_eh"]) / (r * m),
                               float(jnp.mean(new.eh)), rtol=1e-10)
    np.testing.assert_allclose(float(out["sum_log_lh"]) / (r * m),
                               float(jnp.mean(jnp.log(new.lh))),
                               rtol=1e-10)


def test_vb_run_epi_matches_eager_fused_loop():
    """Full convergence loop with the Pallas posterior epilogue: same
    n_iter, same recorded lml, same factors and hypers as the eager
    fused loop (up to digamma_approx/gammaln_approx, < 1e-12 rel in
    f64)."""
    from ccfindr_tpu.ops.pallas import epilogue as ep
    from ccfindr_tpu.ops.pallas import vb_kernels as pk
    from ccfindr_tpu.ops.vb import Hyper, VBState

    import ccfindr_tpu as cf

    sim = cf.simulate_whx(nrow=24, ncol=36, rank=3, seed=7)
    x = np.asarray(sim["x"], np.float64)
    n, m = x.shape
    r = 4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)))
    h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)))
    st = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                 dh=jnp.zeros_like(h),
                 lkh=jnp.asarray(-jnp.inf, jnp.float64))
    hy = Hyper(*(jnp.asarray(v, jnp.float64) for v in (1.,) * 4))
    xj = jnp.asarray(x)

    ref = vb_ops.vb_run(xj, st, hy, itmax=200, tol=1e-5,
                        fused=vb_ops.fused_dense)
    bn, bm = 8, 8
    xp = pk.pad_matrix(xj, bn, bm)
    got = ep.vb_run_epi(xp, st, hy, itmax=200, tol=1e-5, bn=bn,
                        bm=bm, m_true=m)
    assert int(got.n_iter) == int(ref.n_iter)
    np.testing.assert_allclose(float(got.lml), float(ref.lml),
                               rtol=1e-9)
    for f in ["ew", "eh", "lw", "lh", "dw", "dh"]:
        np.testing.assert_allclose(np.asarray(getattr(got.state, f)),
                                   np.asarray(getattr(ref.state, f)),
                                   rtol=1e-7, err_msg=f)
    for f in ["aw", "bw", "ah", "bh"]:
        np.testing.assert_allclose(float(getattr(got.hyper, f)),
                                   float(getattr(ref.hyper, f)),
                                   rtol=1e-9)


def test_vb_run_epi_vmapped_rank_masks():
    """Batched rank sweep through the all-Pallas loop: vmapped
    instances at ranks 3..5 padded to rmax with per-instance rank
    masks reproduce the eager fused loop instance-for-instance."""
    from ccfindr_tpu.ops.pallas import epilogue as ep
    from ccfindr_tpu.ops.pallas import vb_kernels as pk
    from ccfindr_tpu.ops.vb import Hyper, VBState

    import ccfindr_tpu as cf

    sim = cf.simulate_whx(nrow=24, ncol=36, rank=3, seed=7)
    x = np.asarray(sim["x"], np.float64)
    n, m = x.shape
    rmax = 5
    ranks = [3, 4, 5]
    B = len(ranks)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.gamma(1.0, 1.0, (B, n, rmax)))
    h = jnp.asarray(rng.gamma(1.0, 1.0, (B, rmax, m)))
    sts = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                  dh=jnp.zeros_like(h), lkh=jnp.full((B,), -jnp.inf))
    hys = Hyper(*(jnp.ones((B,)) for _ in range(4)))
    rmask = jnp.asarray((np.arange(rmax)[None, :]
                         < np.asarray(ranks)[:, None]
                         ).astype(np.float64))
    rtrue = jnp.asarray(np.asarray(ranks, np.float64))
    xj = jnp.asarray(x)

    ref = jax.vmap(lambda st, hy, rm, rt: vb_ops.vb_run(
        xj, st, hy, itmax=150, tol=1e-5, rank_mask=rm, r_true=rt,
        fused=vb_ops.fused_dense))(sts, hys, rmask, rtrue)

    bn, bm = 8, 8
    xp = pk.pad_matrix(xj, bn, bm)
    got = jax.vmap(lambda st, hy, rm, rt: ep.vb_run_epi(
        xp, st, hy, itmax=150, tol=1e-5, bn=bn, bm=bm,
        rank_mask=rm, r_true=rt, m_true=m))(sts, hys, rmask, rtrue)

    np.testing.assert_array_equal(np.asarray(got.n_iter),
                                  np.asarray(ref.n_iter))
    np.testing.assert_allclose(np.asarray(got.lml),
                               np.asarray(ref.lml), rtol=1e-9)
    for f in ["ew", "eh", "lw", "lh", "dw", "dh"]:
        np.testing.assert_allclose(np.asarray(getattr(got.state, f)),
                                   np.asarray(getattr(ref.state, f)),
                                   rtol=1e-6, err_msg=f)
