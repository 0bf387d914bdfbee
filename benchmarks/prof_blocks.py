"""X-pass kernel block-size sweep (real TPU) — is the ~20us gap over
the 164us X-stream floor grid overhead?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ccfindr_tpu.ops.pallas import vb_kernels as pk

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.poisson(2.0, (n, m)).astype(np.float32))
lw = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
lh = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
rp_ = 16
lw_p, lh_p = pk._pad_factors(lw, lh, n, m, rp_)


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


for bn, bm in [(1024, 512), (1024, 1024), (2048, 512), (512, 512),
               (1024, 2048)]:
    try:
        def body(i, c, bn=bn, bm=bm):
            lwc, lhc = c
            swn, shn, xlog = pk.fused_pallas_raw(x, lwc, lhc,
                                                 bn=bn, bm=bm)
            return (lwc + 1e-30 * swn * xlog, lhc + 1e-30 * shn)
        t = timed(body, (lw_p, lh_p))
        print(f"bn={bn:5d} bm={bm:5d}: {t:7.1f} us", flush=True)
    except Exception as e:
        print(f"bn={bn:5d} bm={bm:5d}: FAIL {str(e)[:80]}", flush=True)
