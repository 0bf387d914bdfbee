"""Decompose the production VB sweep cost on the real TPU.

Times (device-side, differenced k-loops):
  1. fused X-pass kernel alone
  2. + posterior_update (gamma posterior + deferred ELBO)
  3. + hyper_update   (= the full production sweep)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/prof_epilogue.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ccfindr_tpu.ops.vb import (Hyper, VBState, hyper_update,  # noqa: E402
                                posterior_update)
from ccfindr_tpu.ops.pallas import vb_kernels as pk  # noqa: E402

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
hf = rng.gamma(0.5, 1.0, (r, m)).astype(np.float32)
scale = 2.0 * n * m / float(wf.sum(axis=0) @ hf.sum(axis=1))
x = jnp.asarray(rng.poisson(wf @ hf * scale).astype(np.float32))
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                dh=jnp.zeros_like(h),
                lkh=jnp.asarray(-jnp.inf, jnp.float32))
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1., 1., 1., 1.)))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
lgx = jnp.sum(jax.scipy.special.gammaln(x + 1.0))
x_pad = pk.pad_matrix(x)
fused = lambda xx, lw, lh: pk.fused_pallas_padded(  # noqa: E731
    xx, lw, lh, n=n, m=m, r=r, bn=pk.DEFAULT_BN, bm=pk.DEFAULT_BM)
mask = (True, True, True, True)


def timed(body, carry, k1=64, k2=320, reps=3):
    f1 = jax.jit(lambda c: lax.fori_loop(0, k1, body, c))
    f2 = jax.jit(lambda c: lax.fori_loop(0, k2, body, c))
    jax.block_until_ready(f1(carry))
    jax.block_until_ready(f2(carry))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f1(carry))
        t1 = time.perf_counter()
        jax.block_until_ready(f2(carry))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best * 1e6


def body_k(i, st):
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    return st._replace(lw=st.lw + 0 * swn * dterm, lh=st.lh + 0 * shn)


def body_kp(i, c):
    st, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    new, pend2 = posterior_update(st.lw * swn, st.lh * shn, st, hyper,
                                  fudge, lgx)
    return new._replace(lkh=(pend + dterm) / (n * m)), pend2


def body_kph(i, c):
    st, pend, hy = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    new, pend2 = posterior_update(st.lw * swn, st.lh * shn, st, hy,
                                  fudge, lgx)
    hy2, _ = hyper_update(mask, new, hy)
    return (new._replace(lkh=(pend + dterm) / (n * m)), pend2, hy2)


t_k = timed(body_k, state)
print("kernel only        : %7.1f us" % t_k, flush=True)
t_kp = timed(body_kp, (state, jnp.float32(0)))
print("kernel+posterior   : %7.1f us  (posterior +%.1f us)"
      % (t_kp, t_kp - t_k), flush=True)
t_kph = timed(body_kph, (state, jnp.float32(0), hyper))
print("full production    : %7.1f us  (hyper     +%.1f us)"
      % (t_kph, t_kph - t_kp), flush=True)
print("sweeps/s full      : %7.0f" % (1e6 / t_kph), flush=True)
