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


def bench_tpu(n=4096, m=8192, r=16, iters=30, dtype=None,
              backend="pallas"):
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

    kw = {}
    if backend == "pallas":
        from ccfindr_tpu.ops.pallas import make_pallas_backend, pad_matrix
        ss, dt_ = make_pallas_backend()
        kw = dict(suffstats=ss, data_term=dt_)
        x = pad_matrix(x)

    @jax.jit
    def sweep_k(state, k):
        def body(i, st):
            return vb_ops.vb_sweep(x, st, hyper, fudge, lgx, **kw)
        return jax.lax.fori_loop(0, k, body, state)

    # warmup/compile
    out = sweep_k(state, 2)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = sweep_k(state, iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return iters / dt


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
