"""Benchmark: VB-NMF sweep throughput on one chip, across backends.

North-star metric (BASELINE.json): VB sweeps/sec/chip on a 10x-scale
count matrix.  The reference publishes no numbers (BASELINE.md), so the
baseline denominator is the measured throughput of the reference's own
math — dense float64 NumPy/BLAS sweeps (the computational twin of the
Eigen/GSL kernel src/vbnmf_update.cpp; NumPy links multi-threaded
OpenBLAS, so this baseline is FASTER than the reference's
single-threaded Eigen) — giving vs_baseline = TPU sweeps/sec / CPU
reference sweeps/sec for the same problem.

Prints one JSON line per config; the NORTH-STAR line (dense fused
pallas, n=4096 m=8192 r=16) is printed LAST.  Timing method: k-sweep
device loops at two lengths, differenced — cancels the ~25 ms
tunneled-dispatch fixed cost per call.

Usage: python bench.py [--quick]   (--quick: north-star config only)
"""

import json
import sys
import time

import numpy as np


def _problem(n, m, r, dtype, density=None, x_dtype=None, seed=0,
             tile_cells=None):
    """Planted-rank-r Poisson counts at mean 2.0.

    Unstructured Poisson noise (round-1's input) has no NMF structure,
    so the empirical-Bayes Newton update never converges and runs all
    99 iterations every sweep — an unrealistic ~2.5x throughput
    penalty.  Planted factors give the convergence behavior of real
    data (the hyper chain exits in a few iterations once warm).

    ``tile_cells=K`` generates an (n, m/K) base block and tiles it K
    times along cells: per-element-rate Poisson sampling runs at only
    ~100 Melem/min, so the 2e9-element atlas config would otherwise
    spend ~20 min in numpy generation for identical per-sweep work.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mb = m // tile_cells if tile_cells else m
    wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
    hf = rng.gamma(0.5, 1.0, (r, mb)).astype(np.float32)
    scale = 2.0 * n * mb / float(wf.sum(axis=0) @ hf.sum(axis=1))
    # blockwise generation + int16 storage bound host memory
    x = np.empty((n, mb), np.int16)
    for i0 in range(0, n, 2048):
        mu = (wf[i0:i0 + 2048] @ hf) * scale
        blk = np.minimum(rng.poisson(mu), 127)   # int8-safe counts
        if density is not None:
            blk = blk * (rng.random(mu.shape) < density)
        x[i0:i0 + 2048] = blk
    if tile_cells:
        x = np.tile(x, (1, tile_cells))
    w = jnp.asarray(rng.gamma(1.0, 1.0, size=(n, r)), dtype)
    h = jnp.asarray(rng.gamma(1.0, 1.0, size=(r, m)), dtype)
    return x, w, h


def _sweep_rate(body, x, state, k1=64, k2=576, reps=3):
    """body(x, carry) -> carry.  X is threaded as a jit ARGUMENT —
    closing over it bakes it into the jaxpr as a constant, and
    lowering/compiling a 2 GB constant (the 100k-cell atlas config)
    takes tens of minutes; as an argument it is just a device buffer
    (the production driver passes X as an argument too)."""
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("k",))
    def sweep_k(x, state, k):
        return jax.lax.fori_loop(0, k, lambda i, st: body(x, st),
                                 state)

    def timed(k):
        out = sweep_k(x, state, k)       # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = sweep_k(x, state, k)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(k1), timed(k2)
    return (k2 - k1) / (t2 - t1)


def bench_vb(n=4096, m=8192, r=16, backend="pallas_fused",
             density=None, x_dtype=None, k=(64, 576),
             tile_cells=None):
    """Device-side VB sweeps/sec for one backend/config."""
    import jax
    import jax.numpy as jnp
    from ccfindr_tpu.ops import vb as vb_ops
    from ccfindr_tpu.ops.vb import Hyper, VBState

    dtype = jnp.float32
    x_np, w, h = _problem(n, m, r, dtype, density=density,
                          tile_cells=tile_cells)
    state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                    dh=jnp.zeros_like(h),
                    lkh=jnp.asarray(-jnp.inf, dtype))
    hyper = Hyper(*(jnp.asarray(v, dtype) for v in (1.0,) * 4))
    fudge = jnp.asarray(np.finfo(np.float32).eps, dtype)
    # hoisted sum(lgamma(x+1)) via a value histogram — counts are
    # small ints, so this avoids materializing an n x m float array
    # on device just for the constant (8 GB at the atlas config)
    from scipy.special import gammaln as _gammaln
    cnt = np.bincount(x_np.ravel(), minlength=2)
    lgx = jnp.asarray(
        float(cnt @ _gammaln(np.arange(len(cnt)) + 1.0)), dtype)

    if backend in ("pallas_fused", "pallas_fused_int8",
                   "pallas_fused_int16"):
        # the PRODUCTION path (vb_factorize backend='pallas'): all-
        # Pallas sweep — X-pass kernel + posterior epilogue kernels +
        # hyper Newton fed by kernel-byproduct means
        from ccfindr_tpu.ops.pallas import vb_kernels as pk
        from ccfindr_tpu.ops.pallas import epilogue as ep

        sd = {"pallas_fused": dtype, "pallas_fused_int8": jnp.int8,
              "pallas_fused_int16": jnp.int16}[backend]
        x = pk.pad_matrix(jnp.asarray(x_np, sd))
        rp_ = max(r, 8)
        layout = pk._fused_layout(x.shape[0], x.shape[1], rp_)
        lw_p, lh_p = pk._pad_factors(w, h, x.shape[0], x.shape[1],
                                     rp_)
        ehs0 = jnp.zeros((8, rp_), dtype).at[0, :r].set(
            jnp.sum(h, axis=1))
        nr, rm = n * r, r * m

        def body(x, carry):
            lw_c, lh_c, ehs, pend, hy = carry
            aw, bw, ah, bh = hy
            swn_p, shn_p, xlog = pk.fused_pallas_raw(
                x, lw_c, lh_c, layout=layout)
            out = ep.posterior_update_pallas(
                swn_p, shn_p, lw_c, lh_c, ehs,
                jnp.stack([aw, bw, ah, bh]), fudge, n=n, m=m, r=r)
            from jax.scipy.special import gammaln as _g
            dterm = -(out["dterm_w"] + out["dterm_h"]) + xlog
            lkh = (pend + dterm) / (n * m)
            u1 = -jnp.dot(out["csum"][0], out["rsum"][0]) - lgx
            cw = nr * (aw * jnp.log(aw / bw) - _g(aw))
            ch = rm * (ah * jnp.log(ah / bh) - _g(ah))
            pend2 = u1 + out["u2"] + cw + out["u3"] + ch + 0 * lkh
            hy2, _ = vb_ops.hyper_update((True,) * 4, None, hy, means=(
                out["sum_log_lw"] / nr, out["sum_ew"] / nr,
                out["sum_log_lh"] / rm, out["sum_eh"] / rm))
            return (out["lw"], out["lh"], out["rsum"], pend2,
                    vb_ops.Hyper(*hy2))

        return _sweep_rate(body, x,
                           (lw_p, lh_p, ehs0, jnp.zeros((), dtype),
                            hyper), k1=k[0], k2=k[1])
    elif backend == "sparse_fused":
        from ccfindr_tpu.ops import sparse as sk
        x = sk.from_dense(x_np, dtype=dtype)
        fused = sk.make_sparse_fused()
    elif backend == "sparse_ell":
        import scipy.sparse as sp

        from ccfindr_tpu.ops import ell as ek
        x = ek.from_scipy_ell(sp.csr_matrix(x_np), dtype=dtype)
        fused = ek.make_ell_fused()
    elif backend == "dense_fused":
        x = jnp.asarray(x_np, dtype)
        fused = vb_ops.fused_dense
    else:
        raise ValueError(backend)

    # the FULL production sweep: fused kernel + posterior update +
    # empirical-Bayes hyper update (vb_run runs all three every sweep
    # at the default hyper_update_dn=1 — benching the kernel alone
    # overstated throughput ~3.5x before hyper_update was optimized)
    def body(x, carry):
        st, hy = carry
        swn, shn, dterm = fused(x, st.lw, st.lh)
        new, pending = vb_ops.posterior_update(
            st.lw * swn, st.lh * shn, st, hy, fudge, lgx)
        hy2, _ = vb_ops.hyper_update((True,) * 4, new, hy)
        return (new._replace(lkh=(pending + dterm) / (n * m)), hy2)

    return _sweep_rate(body, x, (state, hyper), k1=k[0], k2=k[1])


def bench_ml(n=4096, m=8192, r=16, k=(32, 160)):
    """ML (Lee-Seung) path: fused sweep + likelihood rate."""
    import jax.numpy as jnp
    from ccfindr_tpu.ops import ml as ml_ops
    from ccfindr_tpu.ops.pallas import ml_kernels as mlk
    from ccfindr_tpu.ops.pallas import pad_matrix

    dtype = jnp.float32
    x_np, w, h = _problem(n, m, r, dtype)
    xp = pad_matrix(jnp.asarray(x_np, dtype))
    fused_h, fused_w = mlk.make_ml_backend()
    eps = jnp.asarray(np.finfo(np.float32).eps, dtype)

    def body(x, carry):
        w_, h_ = carry
        hn, xlogwh = fused_h(x, w_, h_)
        h2 = jnp.maximum(h_ * hn / jnp.sum(w_, axis=0)[:, None], eps)
        wn = fused_w(x, w_, h2)
        w2 = jnp.maximum(w_ * wn / jnp.sum(h2, axis=1)[None, :], eps)
        return (w2 * (1.0 + 1e-12 * xlogwh), h2)

    return _sweep_rate(body, xp, (w, h), k1=k[0], k2=k[1])


def bench_convergence(n=4096, m=8192, r=16):
    """Time-to-converged-ELBO (the second north-star metric): one
    restart of vb_run on the planted problem, production backend,
    reference defaults (tol=1e-5, hyper cadence n0=10/dn=1)."""
    import jax
    import jax.numpy as jnp
    from ccfindr_tpu.ops import vb as vb_ops
    from ccfindr_tpu.ops.pallas import make_fused_backend, pad_matrix
    from ccfindr_tpu.ops.vb import Hyper

    dtype = jnp.float32
    x_np, w, h = _problem(n, m, r, dtype)
    xp = pad_matrix(jnp.asarray(x_np, dtype))
    hyper = Hyper(*(jnp.asarray(v, dtype) for v in (1.0,) * 4))
    key = jax.random.PRNGKey(0)
    st = vb_ops.vb_init_random(key, n, m, r, hyper, dtype)

    def run():
        return vb_ops.vb_run(xp, st, hyper, itmax=10000, tol=1e-5,
                             fused=make_fused_backend(),
                             m_true=m)
    out = run()                              # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    return time.perf_counter() - t0, int(out.n_iter)


def bench_cpu_reference(n=4096, m=8192, r=16, iters=3):
    """Reference-math throughput: float64 BLAS dense sweeps (the
    Eigen/GSL kernel's computational twin) on the host CPU."""
    from ccfindr_tpu.ops import reference_impl as ref

    rng = np.random.default_rng(0)
    x = rng.poisson(2.0, size=(n, m)).astype(np.float64)
    lw = rng.gamma(1.0, 1.0, size=(n, r))
    lh = rng.gamma(1.0, 1.0, size=(r, m))
    ew, eh = lw.copy(), lh.copy()
    out = ref.vb_sweep_np(x, lw, lh, ew, eh, 1.0, 1.0, 1.0, 1.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ref.vb_sweep_np(x, out["lw"], out["lh"], out["ew"],
                              out["eh"], 1.0, 1.0, 1.0, 1.0)
    dt = time.perf_counter() - t0
    return iters / dt


def bench_workflow():
    """Bundled-dataset full rank scan (2..8 x 3 restarts, batched
    fused-pallas) wall time, warm."""
    import ccfindr_tpu as cf
    from ccfindr_tpu.data import pbmc_sim_dir

    s = cf.read_10x(pbmc_sim_dir())
    s = cf.filter_cells(s, umi_min=700, umi_max=8000, plot=False)
    s = cf.filter_genes(s, vmr_min=1.2, min_cells_expressed=50,
                        plot=False, verbose=False)

    def run():
        return cf.vb_factorize(s, ranks=list(range(2, 9)), nrun=3,
                               verbose=0, Itmax=3000, seed=0,
                               backend="pallas")
    run()                                   # compile
    t0 = time.perf_counter()
    out = run()
    dt = time.perf_counter() - t0
    import ccfindr_tpu as cf2
    ropt = cf2.optimal_rank(out)["ropt"]
    return dt, ropt


def emit(metric, value, unit, vs_baseline=None):
    rec = {"metric": metric, "value": round(float(value), 3),
           "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 2)
    print(json.dumps(rec), flush=True)


def main():
    quick = "--quick" in sys.argv
    n, m, r = 4096, 8192, 16
    cpu_sps = bench_cpu_reference(n, m, r)

    if not quick:
        # rank sweep on the production fused kernel
        for rr in (8, 32):
            sps = bench_vb(n, m, rr)
            emit(f"vb_sweeps_per_sec_chip_n{n}_m{m}_r{rr}", sps,
                 "sweeps/s")
        # compressed integer X storage (same math, 4x/2x less X HBM)
        for be, tag in (("pallas_fused_int8", "int8"),
                        ("pallas_fused_int16", "int16")):
            sps = bench_vb(n, m, r, backend=be)
            emit(f"vb_sweeps_per_sec_chip_n{n}_m{m}_r{r}_x{tag}", sps,
                 "sweeps/s")
        # sparse backends at scRNA density (10%): COO scan and the
        # gather-only dual-ELL layout (no XLA scatters)
        sps = bench_vb(2048, 8192, r, backend="sparse_fused",
                       density=0.10, k=(8, 40))
        emit(f"vb_sweeps_per_sec_chip_n2048_m8192_r{r}_sparse10pct",
             sps, "sweeps/s")
        sps = bench_vb(2048, 8192, r, backend="sparse_ell",
                       density=0.10, k=(16, 80))
        emit(f"vb_sweeps_per_sec_chip_n2048_m8192_r{r}_sparse_ell10pct",
             sps, "sweeps/s")
        # dense fused on the same 10%-density matrix (the comparison
        # BASELINE.md's sparse-strategy note discusses)
        sps = bench_vb(2048, 8192, r, backend="pallas_fused",
                       density=0.10)
        emit(f"vb_sweeps_per_sec_chip_n2048_m8192_r{r}_dense10pct",
             sps, "sweeps/s")
        # gene-major layout (large gene panel)
        sps = bench_vb(65536, 512, r, k=(32, 160))
        emit(f"vb_sweeps_per_sec_chip_n65536_m512_r{r}_genemajor",
             sps, "sweeps/s")
        # 100k-cell atlas on ONE chip: int8 X (20k genes x 100k cells
        # = 2 GB on device) — the scale BASELINE.md's atlas config
        # targets, feasible single-chip via compressed dense storage
        sps = bench_vb(20480, 100352, 20, backend="pallas_fused_int8",
                       k=(2, 10), tile_cells=49)
        emit("vb_sweeps_per_sec_chip_n20480_m100352_r20_xint8_atlas",
             sps, "sweeps/s")
        # ML (Lee-Seung) fused path
        sps = bench_ml(n, m, r)
        emit(f"ml_sweeps_per_sec_chip_n{n}_m{m}_r{r}", sps,
             "sweeps/s")
        # time-to-converged-ELBO, one restart, reference defaults
        dt, nit = bench_convergence(n, m, r)
        emit(f"vb_time_to_converged_elbo_n{n}_m{m}_r{r}", dt, "s")
        emit(f"vb_sweeps_to_converged_elbo_n{n}_m{m}_r{r}", nit,
             "sweeps")
        # bundled-dataset full rank scan
        try:
            dt, ropt = bench_workflow()
            emit("bundled_rank_scan_2to8x3_wall", dt, "s")
            emit("bundled_optimal_rank", ropt, "rank")
        except Exception as e:          # noqa: BLE001
            print(json.dumps({"metric": "bundled_rank_scan_2to8x3_wall",
                              "error": str(e)[:200]}), flush=True)

    # NORTH STAR last: production fused kernel at the headline shape
    tpu_sps = bench_vb(n, m, r)
    emit(f"vb_sweeps_per_sec_chip_n{n}_m{m}_r{r}", tpu_sps, "sweeps/s",
         vs_baseline=tpu_sps / cpu_sps)


if __name__ == "__main__":
    main()
