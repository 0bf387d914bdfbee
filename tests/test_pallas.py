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
