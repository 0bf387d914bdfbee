"""Differential tests for the single-launch 'sol' sweep
(ops/pallas/sol.py) against the two-kernel epilogue path
(ops/pallas/epilogue.py) — the production paths must agree.

Run in interpreter mode on CPU in float64, where the only expected
differences are (a) SMEM-accumulation order of the scalar reductions
and (b) digamma_approx/gammaln_approx vs jax.scipy in the in-kernel
Newton/constants — both ~1e-12 relative.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.vb import Hyper, VBState
from ccfindr_tpu.ops.pallas import epilogue as ep
from ccfindr_tpu.ops.pallas import sol
from ccfindr_tpu.ops.pallas import vb_kernels as pk

BN, BM = 8, 128


def _planted(n, m, r, seed=0):
    rng = np.random.default_rng(seed)
    wf = rng.gamma(0.8, 1.0, (n, r))
    hf = rng.gamma(0.8, 1.0, (r, m))
    x = rng.poisson(wf @ hf * (2.0 * n * m / (wf @ hf).sum()))
    return x.astype(np.float64)


def _init(n, m, r, seed=1):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)))
    h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)))
    return VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                   dh=jnp.zeros_like(h), lkh=jnp.asarray(-jnp.inf,
                                                         w.dtype))


def _run_pair(n, m, r, itmax, seed=0, **kw):
    x = jnp.asarray(_planted(n, m, r, seed))
    xp = pk.pad_matrix(x, BN, BM)
    st = _init(n, m, r)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    out_e = ep.vb_run_epi(xp, st, hy, itmax=itmax, tol=1e-6,
                          bn=BN, bm=BM, **kw)
    out_s = sol.vb_run_sol(xp, st, hy, itmax=itmax, tol=1e-6,
                           bn=BN, bm=BM, **kw)
    return out_e, out_s


def _assert_close(out_e, out_s, rtol=1e-9):
    assert int(out_e.n_iter) == int(out_s.n_iter)
    np.testing.assert_allclose(float(out_s.lml), float(out_e.lml),
                               rtol=rtol)
    for f in ("ew", "eh", "lw", "lh", "dw", "dh"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_s.state, f)),
            np.asarray(getattr(out_e.state, f)), rtol=1e-7,
            err_msg=f)
    for f in ("aw", "bw", "ah", "bh"):
        np.testing.assert_allclose(
            float(getattr(out_s.hyper, f)),
            float(getattr(out_e.hyper, f)), rtol=1e-8, err_msg=f)


def test_sol_single_sweep_matches_epilogue():
    """One sweep: every kernel output against the two-kernel path."""
    n, m, r = 24, 256, 5
    x = jnp.asarray(_planted(n, m, r))
    xp = pk.pad_matrix(x, BN, BM)
    np_, mp_ = xp.shape
    rp_ = 8
    st = _init(n, m, r)
    fudge = jnp.asarray(np.finfo(np.float64).eps)
    hv = jnp.asarray([1.0, 1.0, 1.0, 1.0])

    # epilogue path
    lw_p, lh_p = pk._pad_factors(st.lw, st.lh, np_, mp_, rp_)
    ehs = jnp.zeros((8, rp_)).at[0, :r].set(jnp.sum(st.eh, axis=1))
    swn_p, shn_p, xlog = pk.fused_pallas_raw(xp, lw_p, lh_p,
                                             bn=BN, bm=BM)
    out = ep.posterior_update_pallas(swn_p, shn_p, lw_p, lh_p, ehs,
                                     hv, fudge, n=n, m=m, r=r,
                                     bn=BN, bm=BM)

    # sol path
    lwt_p, lh_p2 = sol._pad_factors_t(st.lw, st.lh, np_, mp_, rp_)
    np.testing.assert_array_equal(np.asarray(lh_p2),
                                  np.asarray(lh_p))
    eh_p = jnp.pad(st.eh, ((0, rp_ - r), (0, mp_ - m)))
    sc = jnp.concatenate([hv, jnp.asarray([float(fudge), float(r),
                                           0.0, 1.0])])[None, :]
    (ewt, lwtn, dwt, eh, lhn, dh, scal) = sol.sol_sweep(
        xp, lwt_p, lh_p2, eh_p, sc, n=n, m_arr=m, m_live=m, r=r,
        bn=BN, bm=BM)

    np.testing.assert_allclose(np.asarray(ewt.T), np.asarray(out["ew"]),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(lwtn.T),
                               np.asarray(out["lw"]), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dwt.T), np.asarray(out["dw"]),
                               rtol=1e-10)
    for k in ("eh", "lh", "dh"):
        np.testing.assert_allclose(np.asarray({"eh": eh, "lh": lhn,
                                               "dh": dh}[k]),
                                   np.asarray(out[k]), rtol=1e-10,
                                   err_msg=k)
    # scalar sums (SMEM accumulation order differs -> tolerance)
    pairs = [(sol._U2, "u2"), (sol._U3, "u3"), (sol._SEW, "sum_ew"),
             (sol._SLW, "sum_log_lw"), (sol._SEH, "sum_eh"),
             (sol._SLH, "sum_log_lh"), (sol._DTW, "dterm_w"),
             (sol._DTH, "dterm_h")]
    for slot, key in pairs:
        np.testing.assert_allclose(float(scal[0, slot]),
                                   float(out[key]), rtol=1e-9,
                                   err_msg=key)
    np.testing.assert_allclose(float(scal[0, sol._XLOG]), float(xlog),
                               rtol=1e-9)

    # in-kernel Newton vs ops.vb.hyper_update on the same means
    nr, rm = n * r, r * m
    hy2, failed = vb_ops.hyper_update(
        (True,) * 4, None, Hyper(*hv),
        means=(out["sum_log_lw"] / nr, out["sum_ew"] / nr,
               out["sum_log_lh"] / rm, out["sum_eh"] / rm))
    for slot, want in zip((sol._AW, sol._BW, sol._AH, sol._BH), hy2):
        np.testing.assert_allclose(float(scal[0, slot]), float(want),
                                   rtol=1e-8)
    assert bool(scal[0, sol._HFAIL] > 0) == bool(failed)


@pytest.mark.parametrize("itmax", [3, 60])
def test_vb_run_sol_matches_epi(itmax):
    out_e, out_s = _run_pair(24, 256, 4, itmax)
    _assert_close(out_e, out_s)


def test_vb_run_sol_converges_same_sweep():
    """Full convergence on a planted problem: same stopping sweep and
    the same evidence as the epilogue path."""
    out_e, out_s = _run_pair(32, 384, 3, 500, seed=3)
    assert int(out_s.n_iter) < 500
    _assert_close(out_e, out_s)


def test_vb_run_sol_rank_mask():
    """Batched-rank prefix masks: padded instance == epi's."""
    n, m, r_pad, r_true = 24, 256, 6, 4
    x = jnp.asarray(_planted(n, m, r_true, seed=5))
    xp = pk.pad_matrix(x, BN, BM)
    st = _init(n, m, r_pad, seed=2)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    rmask = jnp.asarray((np.arange(r_pad) < r_true).astype(np.float64))
    kw = dict(itmax=40, tol=1e-6, bn=BN, bm=BM, rank_mask=rmask,
              r_true=jnp.asarray(float(r_true)))
    out_e = ep.vb_run_epi(xp, st, hy, **kw)
    out_s = sol.vb_run_sol(xp, st, hy, **kw)
    _assert_close(out_e, out_s)


def test_vb_run_sol_cell_padding():
    """Mesh cell padding (m_true < array extent) matches epi."""
    n, m_true, m_pad, r = 24, 200, 256, 3
    x = jnp.asarray(_planted(n, m_true, r, seed=7))
    x_arr = jnp.pad(x, ((0, 0), (0, m_pad - m_true)))
    xp = pk.pad_matrix(x_arr, BN, BM)
    st = _init(n, m_pad, r, seed=4)
    cmask = jnp.asarray((np.arange(m_pad) < m_true
                         ).astype(np.float64))[None, :]
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    kw = dict(itmax=40, tol=1e-6, bn=BN, bm=BM, cell_mask=cmask,
              m_true=m_true)
    out_e = ep.vb_run_epi(xp, st, hy, **kw)
    out_s = sol.vb_run_sol(xp, st, hy, **kw)
    _assert_close(out_e, out_s)


def test_vb_run_sol_resume_bit_exact():
    """it0/lk0_init chunked resume reproduces the uninterrupted run
    exactly (the checkpointing contract of the chunked driver)."""
    n, m, r = 24, 256, 3
    x = jnp.asarray(_planted(n, m, r, seed=9))
    xp = pk.pad_matrix(x, BN, BM)
    st = _init(n, m, r, seed=5)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    full = sol.vb_run_sol(xp, st, hy, itmax=30, tol=0.0, bn=BN, bm=BM)
    part = sol.vb_run_sol(xp, st, hy, itmax=12, tol=0.0, bn=BN, bm=BM)
    st2 = part.state
    resumed = sol.vb_run_sol(xp, st2, part.hyper, itmax=30, tol=0.0,
                             bn=BN, bm=BM, it0=13,
                             lk0_init=part.lml)
    assert int(full.n_iter) == 30
    for f in ("ew", "eh", "lw", "lh"):
        np.testing.assert_array_equal(
            np.asarray(getattr(resumed.state, f)),
            np.asarray(getattr(full.state, f)), err_msg=f)
    np.testing.assert_array_equal(float(resumed.lml), float(full.lml))


def test_vb_run_sol_vmap():
    """vmapped instances equal per-instance runs (batched driver)."""
    n, m, r = 16, 256, 3
    x = jnp.asarray(_planted(n, m, r, seed=11))
    xp = pk.pad_matrix(x, BN, BM)
    sts = [_init(n, m, r, seed=s) for s in (1, 2)]
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    batch_st = jax.tree.map(lambda *a: jnp.stack(a), *sts)
    batch_hy = Hyper(*(jnp.full((2,), 1.0, jnp.float64),) * 4)
    outs = jax.vmap(lambda s, h: sol.vb_run_sol(
        xp, s, h, itmax=20, tol=1e-6, bn=BN, bm=BM))(batch_st,
                                                     batch_hy)
    for b, st in enumerate(sts):
        solo = sol.vb_run_sol(xp, st, hy, itmax=20, tol=1e-6,
                              bn=BN, bm=BM)
        np.testing.assert_allclose(float(outs.lml[b]),
                                   float(solo.lml), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(outs.state.ew[b]),
                                   np.asarray(solo.state.ew),
                                   rtol=1e-12)


def test_vb_run_sol_int_storage():
    """Integer X storage: same results as float X (values equal)."""
    n, m, r = 16, 256, 3
    x = _planted(n, m, r, seed=13)
    st = _init(n, m, r, seed=6)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    xf = pk.pad_matrix(jnp.asarray(x), BN, BM)
    xi = pk.pad_matrix(jnp.asarray(x.astype(np.int16)), BN, BM)
    of = sol.vb_run_sol(xf, st, hy, itmax=15, tol=1e-6, bn=BN, bm=BM)
    oi = sol.vb_run_sol(xi, st, hy, itmax=15, tol=1e-6, bn=BN, bm=BM)
    np.testing.assert_allclose(float(oi.lml), float(of.lml),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(oi.state.ew),
                               np.asarray(of.state.ew), rtol=1e-12)


def test_vb_run_sol_elbo_every():
    """elbo_every=k: conservative stopping (never earlier), final
    evidence within the convergence tolerance of the per-sweep rule,
    and n_iter lands on the cadence."""
    n, m, r = 32, 384, 3
    x = jnp.asarray(_planted(n, m, r, seed=21))
    xp = pk.pad_matrix(x, BN, BM)
    st = _init(n, m, r, seed=8)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    kw = dict(itmax=800, tol=1e-6, bn=BN, bm=BM)
    o1 = sol.vb_run_sol(xp, st, hy, **kw)
    o4 = sol.vb_run_sol(xp, st, hy, elbo_every=4, **kw)
    assert int(o1.n_iter) < 800 and int(o4.n_iter) < 800
    assert int(o4.n_iter) >= int(o1.n_iter)
    # converged evidence: the cadence run stops later, so its ELBO is
    # >= (monotone) and within a few tolerances of the per-sweep rule
    assert float(o4.lml) >= float(o1.lml) - 1e-12
    np.testing.assert_allclose(float(o4.lml), float(o1.lml),
                               rtol=5e-5)
    # k=1 stays bit-identical to the default
    o1b = sol.vb_run_sol(xp, st, hy, elbo_every=1, **kw)
    np.testing.assert_array_equal(np.asarray(o1b.state.ew),
                                  np.asarray(o1.state.ew))


def test_driver_elbo_every(tmp_path):
    """vb_factorize(elbo_every=...) runs on the pallas backend and
    rejects other backends."""
    import ccfindr_tpu as cf

    sim = cf.simulate_whx(nrow=25, ncol=40, rank=3, seed=31)
    s = cf.SCSet(count=sim["x"])
    a = cf.vb_factorize(s, ranks=[3], nrun=2, verbose=0, Itmax=400,
                        seed=4, backend="pallas")
    b = cf.vb_factorize(s, ranks=[3], nrun=2, verbose=0, Itmax=400,
                        seed=4, backend="pallas", elbo_every=5)
    assert b.measure["lml"][0] >= a.measure["lml"][0] - 1e-12
    np.testing.assert_allclose(b.measure["lml"][0],
                               a.measure["lml"][0], rtol=1e-3)
    with pytest.raises(ValueError, match="elbo_every"):
        cf.vb_factorize(s, ranks=[3], nrun=1, verbose=0,
                        backend="dense", elbo_every=5)


def test_vb_run_sol_mxu_bf16():
    """precision='bf16' (bf16 MXU operands, f32 accumulation) stays
    within ~1e-3 relative of the full-precision fixed point and
    yields the same hard clustering."""
    n, m, r = 24, 40, 3
    x = jnp.asarray(_planted(n, m, r))
    xp = pk.pad_matrix(x, BN, BM)
    st = _init(n, m, r)
    hy = Hyper(*(jnp.asarray(1.0, jnp.float64),) * 4)
    kw = dict(itmax=30, tol=1e-6, bn=BN, bm=BM)
    out = sol.vb_run_sol(xp, st, hy, **kw)
    out_b = sol.vb_run_sol(xp, st, hy, mxu_bf16=True, **kw)
    np.testing.assert_allclose(float(out_b.lml), float(out.lml),
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(out_b.state.eh),
                               np.asarray(out.state.eh),
                               rtol=0.25, atol=1e-2)
    assert (np.argmax(np.asarray(out_b.state.eh), axis=0)
            == np.argmax(np.asarray(out.state.eh), axis=0)).all()


def test_driver_precision_bf16():
    """vb_factorize(precision='bf16') runs on the pallas backend,
    matches f32 rank selection, and rejects other backends."""
    import ccfindr_tpu as cf

    sim = cf.simulate_whx(nrow=25, ncol=40, rank=3, seed=31)
    s = cf.SCSet(count=sim["x"])
    a = cf.vb_factorize(s, ranks=[3], nrun=2, verbose=0, Itmax=300,
                        seed=4, backend="pallas")
    b = cf.vb_factorize(s, ranks=[3], nrun=2, verbose=0, Itmax=300,
                        seed=4, backend="pallas", precision="bf16")
    # convergence-point (not per-sweep) comparison, and best-of-nrun
    # selection may pick a different restart under the bf16
    # perturbation — tolerance is necessarily loose
    np.testing.assert_allclose(b.measure["lml"][0],
                               a.measure["lml"][0], rtol=5e-2)
    with pytest.raises(ValueError, match="precision"):
        cf.vb_factorize(s, ranks=[3], nrun=1, verbose=0,
                        backend="dense", precision="bf16")


def test_sol_kahan_elbo_accumulation_precision():
    """The single-launch kernel's SMEM scalar accumulators are
    Kahan-compensated (round-3 weakness 3 / SURVEY §7.3): the f32
    cross-step sum of the O(n*m) x*log(wth) data term must track the
    f64 reference at f32-ulp level even over many grid steps, where a
    naive running f32 sum drifts by orders of magnitude more."""
    import numpy as np

    import jax.numpy as jnp

    from ccfindr_tpu.ops.pallas import sol as sp
    from ccfindr_tpu.ops.pallas.vb_kernels import pad_matrix

    n, m, r = 256, 4096, 4
    rng = np.random.default_rng(0)
    x = rng.poisson(20.0, size=(n, m)).astype(np.float32)
    lw = rng.gamma(4.0, 1.0, size=(n, r)).astype(np.float32)
    lh = rng.gamma(4.0, 1.0, size=(r, m)).astype(np.float32)
    eh = lh.copy()

    # small blocks -> 512 sequential grid steps for the accumulator
    bn, bm = 32, 256
    xp = pad_matrix(jnp.asarray(x), bn=bn, bm=bm)
    rp = 8
    lwt_p, lh_p = sp._pad_factors_t(jnp.asarray(lw), jnp.asarray(lh),
                                    xp.shape[0], xp.shape[1], rp)
    eh_p = jnp.pad(jnp.asarray(eh), ((0, rp - r), (0, 0)))
    sc = jnp.asarray([[1.0, 1.0, 1.0, 1.0,
                       np.finfo(np.float32).eps, float(r), 0.0,
                       1.0]], jnp.float32)
    out = sp.sol_sweep(xp, lwt_p, lh_p, eh_p, sc, n=n, m_arr=m,
                       m_live=m, r=r, bn=bn, bm=bm)
    xlog32 = float(out[-1][0, sp._XLOG])

    wth = lw.astype(np.float64) @ lh.astype(np.float64)
    xlog64 = float(np.sum(x.astype(np.float64) * np.log(wth)))
    # per-step partials are f32 (intra-tile rounding ~3e-8 relative
    # at this size); the compensated CROSS-step chain must not add to
    # that floor.  (The compensation's full payoff is at atlas grid
    # sizes — tens of thousands of steps — where the naive running
    # sum's error grows with step count; here it pins the ulp-level
    # contract at CI scale.)
    assert abs(xlog32 - xlog64) / abs(xlog64) < 3e-7
