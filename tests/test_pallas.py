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
