"""Epilogue kernel block-size sweep (real TPU): is the 59us grid-step
overhead or VPU transcendentals?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ccfindr_tpu.ops.vb import Hyper
from ccfindr_tpu.ops.pallas import vb_kernels as pk
from ccfindr_tpu.ops.pallas import epilogue as ep

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1.,)*4))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
rp_ = 16
lw_p, lh_p = pk._pad_factors(w, h, n, m, rp_)
swn_p = jnp.abs(jnp.asarray(rng.normal(2.0, 0.5, (n, rp_)), jnp.float32))
shn_p = jnp.abs(jnp.asarray(rng.normal(2.0, 0.5, (rp_, m)), jnp.float32))
ehs = jnp.zeros((8, rp_), jnp.float32).at[0, :r].set(jnp.sum(h, axis=1))
hv = jnp.stack(list(hyper))


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


for bn, bm in [(1024, 512), (4096, 2048), (4096, 8192)]:
    def body(i, c):
        lwp, lhp, eh8 = c
        out = ep.posterior_update_pallas(
            swn_p + 1e-30*lwp[0, 0], shn_p, lwp, lhp, eh8, hv, fudge,
            n=n, m=m, r=r, bn=bn, bm=bm)
        return (out["lw"], out["lh"], out["rsum"])
    t = timed(body, (lw_p, lh_p, ehs))
    print(f"epilogue pair bn={bn:5d} bm={bm:5d}: {t:7.1f} us", flush=True)
