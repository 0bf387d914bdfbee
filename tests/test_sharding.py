"""Multi-device sharding tests on the virtual 8-CPU mesh.

Validates the SPMD design (cell-sharded X/H, replicated W, runs-sharded
restarts): sharded execution must match single-device results.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import ccfindr_tpu as cf
from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.vb import Hyper


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must provide 8 devices"
    return cf.make_mesh(runs=2, cells=4)


def test_make_mesh_shapes(mesh8):
    assert mesh8.axis_names == ("runs", "cells")
    assert mesh8.devices.shape == (2, 4)


def test_vb_sweep_sharded_matches_single(mesh8):
    sim = cf.simulate_whx(nrow=24, ncol=64, rank=3, seed=42)
    xfull = sim["x"]
    mtrim = (xfull.shape[1] // 4) * 4   # divisible by the cells axis
    x = jnp.asarray(xfull[:, :mtrim])
    key = jax.random.PRNGKey(0)
    hyper = Hyper(*(jnp.asarray(v) for v in (1.0, 1.0, 1.0, 1.0)))
    st = vb_ops.vb_init_random(key, x.shape[0], x.shape[1], 3, hyper,
                               dtype=jnp.float64)
    eps = np.finfo(np.float64).eps
    lgx = jnp.sum(jax.scipy.special.gammaln(x + 1.0))

    ref_out = vb_ops.vb_sweep(x, st, hyper, eps, lgx)

    xs = jax.device_put(x, NamedSharding(mesh8, P(None, "cells")))
    sts = type(st)(
        ew=jax.device_put(st.ew, NamedSharding(mesh8, P(None, None))),
        eh=jax.device_put(st.eh, NamedSharding(mesh8, P(None, "cells"))),
        lw=jax.device_put(st.lw, NamedSharding(mesh8, P(None, None))),
        lh=jax.device_put(st.lh, NamedSharding(mesh8, P(None, "cells"))),
        dw=st.dw, dh=st.dh, lkh=st.lkh)
    shard_out = jax.jit(vb_ops.vb_sweep, static_argnames=())(
        xs, sts, hyper, eps, lgx)

    np.testing.assert_allclose(np.asarray(shard_out.ew),
                               np.asarray(ref_out.ew), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(shard_out.eh),
                               np.asarray(ref_out.eh), rtol=1e-12)
    np.testing.assert_allclose(float(shard_out.lkh),
                               float(ref_out.lkh), rtol=1e-12)


def test_vb_factorize_sharded_matches_unsharded(mesh8):
    """Sharded (cell-padded+masked) vs single-device factorization.

    Sharded reductions reorder float ops, which can shift the sweep at
    which the rel-tol 1e-5 stopping rule fires — so lml agrees at the
    tolerance scale, and hard cluster assignments agree exactly.
    """
    sim = cf.simulate_whx(nrow=20, ncol=33, rank=2, seed=43)
    s = cf.SCSet(count=sim["x"])
    if s.n_cells % 4 == 0:      # ensure the mask-padding path is hit
        s = s[np.arange(s.n_genes), np.arange(s.n_cells - 1)]
    a = cf.vb_factorize(s, ranks=2, nrun=2, verbose=0, Itmax=300,
                        seed=9)
    b = cf.vb_factorize(s, ranks=2, nrun=2, verbose=0, Itmax=300,
                        seed=9, mesh=mesh8)
    np.testing.assert_allclose(a.measure["lml"], b.measure["lml"],
                               rtol=1e-3)
    assert b.coeff[0].shape == a.coeff[0].shape  # padding sliced off
    cid_a = np.argmax(a.coeff[0], axis=0)
    cid_b = np.argmax(b.coeff[0], axis=0)
    np.testing.assert_array_equal(cid_a, cid_b)


def test_ml_factorize_on_mesh_smoke(mesh8):
    # ML driver has no mesh arg yet; ensure plain path passes under the
    # 8-device runtime (placement on device 0).
    x = cf.simulate_data(nfeatures=8, nsamples=[10, 12], seed=44)
    s = cf.SCSet(count=x)
    out = cf.factorize(s, ranks=2, nrun=2, verbose=0, Itmax=100)
    assert out.ranks == [2]
