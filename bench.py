"""Benchmark: VB-NMF sweep throughput on one chip.

North-star metric (BASELINE.json): VB sweeps/sec/chip on a 10x-scale
count matrix.  The reference publishes no numbers (BASELINE.md), so the
baseline denominator is the measured throughput of the reference's own
math — dense float64 NumPy/BLAS sweeps (the Eigen-equivalent of
src/vbnmf_update.cpp) on this host's CPU — giving vs_baseline =
TPU sweeps/sec / CPU reference sweeps/sec for the same problem.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def bench_tpu(n=4096, m=8192, r=16, dtype=None, backend="pallas_fused"):
    """Device-side sweeps/sec: time k1- and k2-sweep device loops and
    difference them, cancelling the fixed per-dispatch cost (the
    tunneled TPU here adds ~25 ms per call, which at small k would
    dominate and UNDER-report the chip's true sweep rate)."""
    import functools

    import jax
    import jax.numpy as jnp
    from ccfindr_tpu.ops import vb as vb_ops
    from ccfindr_tpu.ops.vb import Hyper, VBState

    if dtype is None:
        dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.poisson(2.0, size=(n, m)), dtype)
    w = jnp.asarray(rng.gamma(1.0, 1.0, size=(n, r)), dtype)
    h = jnp.asarray(rng.gamma(1.0, 1.0, size=(r, m)), dtype)
    state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                    dh=jnp.zeros_like(h),
                    lkh=jnp.asarray(-jnp.inf, dtype))
    hyper = Hyper(*(jnp.asarray(v, dtype) for v in (1.0, 1.0, 1.0, 1.0)))
    fudge = jnp.asarray(np.finfo(np.float32).eps, dtype)
    lgx = jnp.sum(jax.scipy.special.gammaln(x + 1.0))

    if backend == "pallas_fused":
        # the production path: one pass over X per sweep
        from ccfindr_tpu.ops.pallas import make_fused_backend, pad_matrix
        fused = make_fused_backend()
        x = pad_matrix(x)

        def body(st):
            swn, shn, dterm = fused(x, st.lw, st.lh)
            new, pending = vb_ops.posterior_update(
                st.lw * swn, st.lh * shn, st, hyper, fudge, lgx)
            return new._replace(lkh=(pending + dterm) / (n * m))
    else:
        kw = {}
        if backend == "pallas":
            from ccfindr_tpu.ops.pallas import (make_pallas_backend,
                                                pad_matrix)
            ss, dt_ = make_pallas_backend()
            kw = dict(suffstats=ss, data_term=dt_)
            x = pad_matrix(x)

        def body(st):
            return vb_ops.vb_sweep(x, st, hyper, fudge, lgx, **kw)

    @functools.partial(jax.jit, static_argnames=("k",))
    def sweep_k(state, k):
        return jax.lax.fori_loop(0, k, lambda i, st: body(st), state)

    def timed(k):
        out = sweep_k(state, k)          # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = sweep_k(state, k)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 64, 576
    t1, t2 = timed(k1), timed(k2)
    return (k2 - k1) / (t2 - t1)


def bench_cpu_reference(n=4096, m=8192, r=16, iters=3):
    """Reference-math throughput: float64 BLAS dense sweeps (the
    Eigen/GSL kernel's computational twin) on the host CPU."""
    from ccfindr_tpu.ops import reference_impl as ref

    rng = np.random.default_rng(0)
    x = rng.poisson(2.0, size=(n, m)).astype(np.float64)
    lw = rng.gamma(1.0, 1.0, size=(n, r))
    lh = rng.gamma(1.0, 1.0, size=(r, m))
    ew, eh = lw.copy(), lh.copy()
    # warmup
    out = ref.vb_sweep_np(x, lw, lh, ew, eh, 1.0, 1.0, 1.0, 1.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ref.vb_sweep_np(x, out["lw"], out["lh"], out["ew"],
                              out["eh"], 1.0, 1.0, 1.0, 1.0)
    dt = time.perf_counter() - t0
    return iters / dt


def main():
    n, m, r = 4096, 8192, 16
    tpu_sps = bench_tpu(n, m, r)
    cpu_sps = bench_cpu_reference(n, m, r)
    print(json.dumps({
        "metric": f"vb_sweeps_per_sec_chip_n{n}_m{m}_r{r}",
        "value": round(tpu_sps, 3),
        "unit": "sweeps/s",
        "vs_baseline": round(tpu_sps / cpu_sps, 2),
    }))


if __name__ == "__main__":
    main()
