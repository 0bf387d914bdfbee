"""Decompose the epi sweep's non-X-kernel cost (real TPU)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ccfindr_tpu.ops.vb import Hyper, VBState, hyper_update
from ccfindr_tpu.ops.pallas import vb_kernels as pk
from ccfindr_tpu.ops.pallas import epilogue as ep

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
hf = rng.gamma(0.5, 1.0, (r, m)).astype(np.float32)
scale = 2.0 * n * m / float(wf.sum(axis=0) @ hf.sum(axis=1))
x_np = np.minimum(rng.poisson(wf @ hf * scale), 127)
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1.,)*4))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
mask = (True,)*4
rp_ = 16
nr, rm = n*r, r*m
x_pad = pk.pad_matrix(jnp.asarray(x_np, jnp.float32))
lw_p0, lh_p0 = pk._pad_factors(w, h, x_pad.shape[0], x_pad.shape[1], rp_)
ehs0 = jnp.zeros((8, rp_), jnp.float32).at[0, :r].set(jnp.sum(h, axis=1))


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
        best = min(best, ((t2-t1)-(t1-t0))/(k2-k1))
    return best*1e6


def body_k(i, c):
    lw_p, lh_p = c
    swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, lw_p, lh_p)
    return (lw_p + 1e-30*swn_p*xlog, lh_p + 1e-30*shn_p)
print("X-kernel only     : %7.1f us" % timed(body_k, (lw_p0, lh_p0)), flush=True)


def body_ke(i, c):
    lw_p, lh_p, ehs = c
    swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, lw_p, lh_p)
    out = ep.posterior_update_pallas(
        swn_p, shn_p, lw_p, lh_p, ehs,
        jnp.stack(list(hyper)), fudge, n=n, m=m, r=r)
    return (out["lw"], out["lh"], out["rsum"])
print("+ epilogue kernels: %7.1f us" % timed(body_ke, (lw_p0, lh_p0, ehs0)), flush=True)


def body_keg(i, c):
    lw_p, lh_p, ehs, pend = c
    aw, bw, ah, bh = hyper
    swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, lw_p, lh_p)
    out = ep.posterior_update_pallas(
        swn_p, shn_p, lw_p, lh_p, ehs,
        jnp.stack([aw, bw, ah, bh]), fudge, n=n, m=m, r=r)
    from jax.scipy.special import gammaln
    dterm = -(out["dterm_w"] + out["dterm_h"]) + xlog
    lkh = (pend + dterm) / (n*m)
    u1 = -jnp.dot(out["csum"][0], out["rsum"][0])
    cw = nr*(aw*jnp.log(aw/bw) - gammaln(aw))
    ch = rm*(ah*jnp.log(ah/bh) - gammaln(ah))
    pend2 = u1 + out["u2"] + cw + out["u3"] + ch + 0*lkh
    return (out["lw"], out["lh"], out["rsum"], pend2)
print("+ ELBO glue       : %7.1f us" % timed(body_keg, (lw_p0, lh_p0, ehs0, jnp.float32(0))), flush=True)


def body_full(i, c):
    lw_p, lh_p, ehs, pend, hy = c
    aw, bw, ah, bh = hy
    swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, lw_p, lh_p)
    out = ep.posterior_update_pallas(
        swn_p, shn_p, lw_p, lh_p, ehs,
        jnp.stack([aw, bw, ah, bh]), fudge, n=n, m=m, r=r)
    from jax.scipy.special import gammaln
    dterm = -(out["dterm_w"] + out["dterm_h"]) + xlog
    lkh = (pend + dterm) / (n*m)
    u1 = -jnp.dot(out["csum"][0], out["rsum"][0])
    cw = nr*(aw*jnp.log(aw/bw) - gammaln(aw))
    ch = rm*(ah*jnp.log(ah/bh) - gammaln(ah))
    pend2 = u1 + out["u2"] + cw + out["u3"] + ch + 0*lkh
    hy2, _ = hyper_update(mask, None, hy, means=(
        out["sum_log_lw"]/nr, out["sum_ew"]/nr,
        out["sum_log_lh"]/rm, out["sum_eh"]/rm))
    return (out["lw"], out["lh"], out["rsum"], pend2, Hyper(*hy2))
print("+ hyper (full)    : %7.1f us" % timed(body_full, (lw_p0, lh_p0, ehs0, jnp.float32(0), hyper)), flush=True)
