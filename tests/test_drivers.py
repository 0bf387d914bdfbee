"""VB driver tests: end-to-end factorization, oracle recovery,
measure-table contract, degeneracy handling."""

import numpy as np
import pytest

import ccfindr_tpu as cf


def test_vb_factorize_fills_slots():
    sim = cf.simulate_whx(nrow=30, ncol=50, rank=3, seed=11)
    s = cf.SCSet(count=sim["x"])
    s = cf.vb_factorize(s, ranks=[2, 3], nrun=2, verbose=0, Itmax=500)
    assert s.ranks == [2, 3]
    assert list(s.measure.columns) == ["rank", "lml", "aw", "bw", "ah",
                                       "bh", "nunif"]
    assert s.basis[0].shape == (s.n_genes, 2)
    assert s.coeff[1].shape == (3, s.n_cells)
    assert s.dbasis[0].shape == (s.n_genes, 2)
    assert (s.dbasis[0] >= 0).all()
    assert np.isfinite(s.measure["lml"]).all()


def test_vb_factorize_empty_guards():
    x = np.array([[1, 2, 0], [0, 0, 0], [2, 1, 0]])
    with pytest.raises(ValueError, match="empty"):
        cf.vb_factorize(cf.SCSet(count=x, remove_zeros=False), ranks=2,
                        verbose=0)


def test_vb_factorize_rank_capped_to_ncol():
    sim = cf.simulate_whx(nrow=40, ncol=6, rank=2, seed=12)
    s = cf.SCSet(count=sim["x"])
    m = s.n_cells
    s = cf.vb_factorize(s, ranks=[2, m + 5], nrun=1, verbose=0,
                        Itmax=200)
    assert s.ranks == [2]


def test_vb_svd_initializers():
    sim = cf.simulate_whx(nrow=25, ncol=30, rank=3, seed=13)
    s = cf.SCSet(count=sim["x"])
    for init in ("svd", "svd2"):
        out = cf.vb_factorize(s, ranks=3, nrun=1, verbose=0,
                              initializer=init, Itmax=300)
        assert out.ranks == [3]
        assert np.isfinite(out.measure["lml"]).all()
    with pytest.raises(ValueError, match="nrun"):
        cf.vb_factorize(s, ranks=3, nrun=2, initializer="svd2")


def test_planted_rank_recovery():
    """simulate_whx data generated at rank 5 -> evidence peaks at 5.

    The statistical oracle from the reference's vignette workflow
    (vignettes/ccfindR.Rmd:414-423).
    """
    sim = cf.simulate_whx(nrow=60, ncol=120, rank=5, aw=0.5, bw=1.0,
                          ah=0.5, bh=1.0, seed=1)
    s = cf.SCSet(count=sim["x"])
    s = cf.vb_factorize(s, ranks=list(range(2, 9)), nrun=3, verbose=0,
                        Itmax=2000, seed=3)
    opt = cf.optimal_rank(s)
    assert opt["ropt"] in (4, 5, 6), f"got {opt}"


def test_cluster_recovery_concordance():
    """Planted hard clusters recovered by argmax-H assignment."""
    x = cf.simulate_data(nfeatures=20, nsamples=[30, 30, 40],
                         generate_factors=True, seed=21)
    true = np.argmax(x["h"], axis=0)
    # only all-zero genes can occur; cells always have counts
    s = cf.SCSet(count=x["x"], remove_zeros=True)
    assert s.n_cells == len(true)
    s = cf.vb_factorize(s, ranks=3, nrun=3, verbose=0, Itmax=1000,
                        seed=5)
    cid = cf.cluster_id(s, rank=3).to_numpy() - 1
    # concordance up to label permutation via contingency argmax
    tab = np.zeros((3, 3))
    for a, b in zip(true, cid):
        tab[a, b] += 1
    acc = sum(tab.max(axis=0)) / len(cid)
    assert acc > 0.95, f"cluster concordance {acc}"


def test_vb_reproducible_with_seed():
    sim = cf.simulate_whx(nrow=20, ncol=25, rank=2, seed=31)
    s = cf.SCSet(count=sim["x"])
    a = cf.vb_factorize(s, ranks=2, nrun=2, verbose=0, Itmax=200, seed=7)
    b = cf.vb_factorize(s, ranks=2, nrun=2, verbose=0, Itmax=200, seed=7)
    np.testing.assert_allclose(a.basis[0], b.basis[0])
    np.testing.assert_allclose(a.measure["lml"], b.measure["lml"])


def test_batch_ranks_single_rank_matches_sequential():
    """With one rank == rmax, the batched path draws identical inits
    and must match the sequential path exactly."""
    sim = cf.simulate_whx(nrow=25, ncol=30, rank=3, seed=41)
    s = cf.SCSet(count=sim["x"])
    a = cf.vb_factorize(s, ranks=3, nrun=2, verbose=0, Itmax=300,
                        seed=17)
    b = cf.vb_factorize(s, ranks=3, nrun=2, verbose=0, Itmax=300,
                        seed=17, batch_ranks=True)
    np.testing.assert_allclose(a.measure["lml"], b.measure["lml"],
                               rtol=1e-12)
    np.testing.assert_allclose(a.basis[0], b.basis[0], rtol=1e-10)


def test_batch_ranks_sweep_recovers_planted_rank():
    sim = cf.simulate_whx(nrow=60, ncol=120, rank=5, aw=0.5, bw=1.0,
                          ah=0.5, bh=1.0, seed=1)
    s = cf.SCSet(count=sim["x"])
    f = cf.vb_factorize(s, ranks=list(range(2, 9)), nrun=3, verbose=0,
                        Itmax=2000, seed=3, batch_ranks=True)
    # over-specified ranks may collapse (uniform column) and drop out
    # of the scan, mirroring the reference's unif.stop behavior
    assert f.ranks[:4] == [2, 3, 4, 5]
    assert f.basis[0].shape[1] == 2          # sliced to true rank
    assert f.coeff[-1].shape[0] == f.ranks[-1]
    opt = cf.optimal_rank(f)
    assert opt["ropt"] in (4, 5, 6), f"got {opt}"


def test_batch_ranks_rejects_svd_init():
    sim = cf.simulate_whx(nrow=20, ncol=25, rank=2, seed=42)
    s = cf.SCSet(count=sim["x"])
    with pytest.raises(ValueError, match="batch_ranks"):
        cf.vb_factorize(s, ranks=2, initializer="svd2",
                        batch_ranks=True)


def test_checkpoint_resume(tmp_path):
    sim = cf.simulate_whx(nrow=20, ncol=25, rank=2, seed=51)
    s = cf.SCSet(count=sim["x"])
    ck = str(tmp_path / "ck")
    a = cf.vb_factorize(s, ranks=[2, 3], nrun=2, verbose=0, Itmax=200,
                        seed=3, checkpoint_dir=ck)
    # resume: both ranks restore from checkpoint, results identical
    b = cf.vb_factorize(s, ranks=[2, 3], nrun=2, verbose=0, Itmax=200,
                        seed=3, checkpoint_dir=ck)
    np.testing.assert_allclose(a.measure["lml"], b.measure["lml"])
    np.testing.assert_allclose(a.basis[0], b.basis[0])
    # partial resume: rank 2 restored, rank 4 computed fresh
    c = cf.vb_factorize(s, ranks=[2, 4], nrun=2, verbose=0, Itmax=200,
                        seed=3, checkpoint_dir=ck)
    np.testing.assert_allclose(c.measure["lml"].iloc[0],
                               a.measure["lml"].iloc[0])


def test_schedule_partition():
    from ccfindr_tpu.parallel import (partition_items, rank_run_grid,
                                      gather_results)
    grid = rank_run_grid([2, 3, 4], 5)
    assert len(grid) == 15
    seen = np.concatenate([partition_items(15, 4, p) for p in range(4)])
    assert sorted(seen.tolist()) == list(range(15))
    vals = np.arange(15, dtype=float)
    mine = partition_items(15, 4, 1)
    out = gather_results(vals[mine], mine, 15)
    np.testing.assert_allclose(out[mine], vals[mine])


def test_vb_backends_agree():
    """dense / dense_fused / pallas (fused) / pallas2pass backends give
    the same factorization: dense vs dense_fused exactly, pallas within
    float tolerance."""
    sim = cf.simulate_whx(nrow=24, ncol=40, rank=3, seed=21)
    s = cf.SCSet(count=sim["x"])
    outs = {b: cf.vb_factorize(s, ranks=3, nrun=2, verbose=0,
                               Itmax=300, backend=b, seed=5)
            for b in ("dense", "dense_fused", "pallas", "pallas2pass")}
    lml = {b: float(o.measure["lml"][0]) for b, o in outs.items()}
    assert lml["dense"] == lml["dense_fused"]
    np.testing.assert_allclose(lml["pallas"], lml["dense"], rtol=1e-6)
    np.testing.assert_allclose(lml["pallas2pass"], lml["dense"],
                               rtol=1e-6)
    np.testing.assert_array_equal(outs["dense"].basis[0],
                                  outs["dense_fused"].basis[0])
    np.testing.assert_allclose(outs["pallas"].basis[0],
                               outs["dense"].basis[0], rtol=1e-4)


def test_checkpoint_every_matches_uninterrupted(tmp_path):
    """Chunked sweep execution (checkpoint_every) gives bit-identical
    results to one uninterrupted run, including after a simulated
    crash + resume."""
    sim = cf.simulate_whx(nrow=25, ncol=40, rank=3, seed=31)
    s = cf.SCSet(count=sim["x"])
    kw = dict(ranks=[2, 3], nrun=2, verbose=0, Itmax=400, seed=4)
    a = cf.vb_factorize(s, **kw)
    b = cf.vb_factorize(s, checkpoint_dir=str(tmp_path / "ck1"),
                        checkpoint_every=30, **kw)
    np.testing.assert_array_equal(a.measure["lml"], b.measure["lml"])
    for k in range(2):
        np.testing.assert_array_equal(a.basis[k], b.basis[k])
        np.testing.assert_array_equal(a.coeff[k], b.coeff[k])

    # simulated crash after the first chunk, then resume
    from ccfindr_tpu.drivers import vb_driver as vd

    orig = vd._chunked_vb
    calls = {"n": 0}

    def boom(call, *args, **kwargs):
        def wrapped(*a, **k):
            calls["n"] += 1
            if calls["n"] == 2:
                raise KeyboardInterrupt
            return call(*a, **k)
        return orig(wrapped, *args, **kwargs)

    vd._chunked_vb = boom
    try:
        with pytest.raises(KeyboardInterrupt):
            cf.vb_factorize(s, checkpoint_dir=str(tmp_path / "ck2"),
                            checkpoint_every=30, **kw)
    finally:
        vd._chunked_vb = orig
    import os
    assert any("vb_sweeps" in f for f in os.listdir(tmp_path / "ck2"))
    c = cf.vb_factorize(s, checkpoint_dir=str(tmp_path / "ck2"),
                        checkpoint_every=30, **kw)
    np.testing.assert_array_equal(a.measure["lml"], c.measure["lml"])
    for k in range(2):
        np.testing.assert_array_equal(a.basis[k], c.basis[k])


def test_f32_f64_rank_selection_concordant():
    """SURVEY §7.1 validation item: float32 (the TPU production dtype)
    and float64 evidence profiles select the same optimal rank on
    oracle data."""
    import jax.numpy as jnp

    sim = cf.simulate_whx(nrow=60, ncol=120, rank=4, seed=12)
    s = cf.SCSet(count=sim["x"])
    kw = dict(ranks=[2, 3, 4, 5, 6], nrun=2, verbose=0, Itmax=1500,
              seed=3)
    r64 = cf.optimal_rank(cf.vb_factorize(s, dtype=jnp.float64, **kw))
    r32 = cf.optimal_rank(cf.vb_factorize(s, dtype=jnp.float32, **kw))
    assert r64["ropt"] == 4
    assert r32["ropt"] == r64["ropt"]


def test_connectivity_running_mean_dispersion(capsys):
    """connectivity=True reports dispersion of the ACROSS-RUN running
    mean connectivity (the reference's intended semantics,
    R/bayesian.R:353-357 — its own conav is re-zeroed per worker)."""
    from ccfindr_tpu.ops import consensus as cons

    sim = cf.simulate_whx(nrow=25, ncol=40, rank=3, seed=4)
    s = cf.vb_factorize(cf.SCSet(count=sim["x"]), ranks=[3], nrun=3,
                        verbose=2, Itmax=300, connectivity=True, seed=1)
    outlines = [ln for ln in capsys.readouterr().out.splitlines()
                if "dispersion" in ln]
    assert len(outlines) == 3
    # recompute the expected final running-mean dispersion from the
    # three runs' H matrices is not possible post-hoc (only the best
    # run is kept), but the reported values must be valid dispersions
    vals = [float(ln.rsplit("=", 1)[1]) for ln in outlines]
    assert all(0.0 <= v <= 1.0 for v in vals)
    # first run's dispersion of a single 0/1 connectivity vector is 1
    assert vals[0] == pytest.approx(1.0)


def test_multihost_requires_random_init():
    sim = cf.simulate_whx(nrow=20, ncol=30, rank=2, seed=1)
    s = cf.SCSet(count=sim["x"])
    with pytest.raises(ValueError, match="initializer='random'"):
        cf.vb_factorize(s, ranks=2, initializer="svd2", verbose=0,
                        _process_count=2, _process_id=0)


def test_storage_dtype_integer_exact():
    """Compressed int16/uint8 X storage is EXACT: counts are integers,
    kernels upcast in VMEM — results match the float-stored run
    bit-for-bit (dense) / at float tolerance (pallas tiles)."""
    sim = cf.simulate_whx(nrow=24, ncol=30, rank=3, seed=13)
    s = cf.SCSet(count=sim["x"])
    kw = dict(ranks=[2, 3], nrun=2, verbose=0, Itmax=300, seed=2)
    a = cf.vb_factorize(s, **kw)
    b = cf.vb_factorize(s, storage_dtype="int16", **kw)
    np.testing.assert_array_equal(a.measure["lml"], b.measure["lml"])
    for k in range(2):
        np.testing.assert_array_equal(a.basis[k], b.basis[k])
    c = cf.vb_factorize(s, storage_dtype="uint8", backend="pallas",
                        **kw)
    np.testing.assert_allclose(a.measure["lml"], c.measure["lml"],
                               rtol=1e-6)

    with pytest.raises(ValueError, match="integer counts"):
        cf.vb_factorize(cf.SCSet(count=sim["x"] + 0.5), ranks=2,
                        verbose=0, storage_dtype="int16")
    with pytest.raises(ValueError, match="overflow"):
        big = sim["x"].copy()
        big[0, 0] = 300.0
        cf.vb_factorize(cf.SCSet(count=big), ranks=2, verbose=0,
                        storage_dtype="uint8")
