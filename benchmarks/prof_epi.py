"""Production sweep with the Pallas posterior epilogue (real TPU).

Times one full production sweep (X-pass kernel + posterior epilogue
kernels + hyper Newton from kernel-byproduct means) at the north-star
shape, f32 and int8 X, vs the round-2 path (X-pass + eager XLA
posterior + eager hyper means).  Also cross-checks one sweep's outputs.
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

from ccfindr_tpu.ops.vb import (Hyper, VBState, hyper_update,  # noqa
                                posterior_update)
from ccfindr_tpu.ops import vb as vb_ops  # noqa: E402
from ccfindr_tpu.ops.pallas import vb_kernels as pk  # noqa: E402
from ccfindr_tpu.ops.pallas import epilogue as ep  # noqa: E402

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
hf = rng.gamma(0.5, 1.0, (r, m)).astype(np.float32)
scale = 2.0 * n * m / float(wf.sum(axis=0) @ hf.sum(axis=1))
x_np = np.minimum(rng.poisson(wf @ hf * scale), 127)
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                dh=jnp.zeros_like(h),
                lkh=jnp.asarray(-jnp.inf, jnp.float32))
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1., 1., 1., 1.)))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
lgx = jnp.asarray(1.0, jnp.float32)
mask = (True, True, True, True)
rp_ = 16
nr, rm = n * r, r * m


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


for xdt, tag in [(jnp.float32, "f32"), (jnp.int8, "int8")]:
    x_pad = pk.pad_matrix(jnp.asarray(x_np, xdt))

    # round-2 path: fused X kernel + eager posterior + eager hyper
    fused = lambda xx, lw, lh: pk.fused_pallas_padded(  # noqa: E731
        xx, lw, lh, n=n, m=m, r=r, bn=pk.DEFAULT_BN, bm=pk.DEFAULT_BM)

    def body_old(i, c):
        st, pend, hy = c
        swn, shn, dterm = fused(x_pad, st.lw, st.lh)
        new, pend2 = posterior_update(st.lw * swn, st.lh * shn, st,
                                      hy, fudge, lgx)
        hy2, _ = hyper_update(mask, new, hy)
        hy2 = Hyper(*(jnp.where(True, a, b) for a, b in zip(hy2, hy)))
        return (new._replace(lkh=(pend + dterm) / (n * m)), pend2, hy2)

    t_old = timed(body_old, (state, jnp.float32(0), hyper))

    # round-3 path: X-pass + Pallas epilogue + means-fed hyper
    lw_p0, lh_p0 = pk._pad_factors(w, h, x_pad.shape[0],
                                   x_pad.shape[1], rp_)
    ehs0 = jnp.zeros((8, rp_), jnp.float32).at[0, :r].set(
        jnp.sum(h, axis=1))

    def body_epi(i, c):
        lw_p, lh_p, ehs, hy, pend, lkh = c
        aw, bw, ah, bh = hy
        swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, lw_p, lh_p)
        out = ep.posterior_update_pallas(
            swn_p, shn_p, lw_p, lh_p, ehs,
            jnp.stack([aw, bw, ah, bh]), fudge, n=n, m=m, r=r)
        dterm = -(out["dterm_w"] + out["dterm_h"]) + xlog
        lkh2 = (pend + dterm) / (n * m)
        u1 = -jnp.dot(out["csum"][0], out["rsum"][0]) - lgx
        from jax.scipy.special import gammaln
        cw = nr * (aw * jnp.log(aw / bw) - gammaln(aw))
        ch = rm * (ah * jnp.log(ah / bh) - gammaln(ah))
        pend2 = u1 + out["u2"] + cw + out["u3"] + ch
        hy2, _ = hyper_update(mask, None, hy, means=(
            out["sum_log_lw"] / nr, out["sum_ew"] / nr,
            out["sum_log_lh"] / rm, out["sum_eh"] / rm))
        return (out["lw"], out["lh"], out["rsum"], Hyper(*hy2),
                pend2, lkh2)

    t_epi = timed(body_epi,
                  (lw_p0, lh_p0, ehs0, hyper, jnp.float32(0),
                   jnp.float32(0)))
    print(f"x={tag}: old {t_old:7.1f} us ({1e6/t_old:6.0f}/s)   "
          f"epi {t_epi:7.1f} us ({1e6/t_epi:6.0f}/s)", flush=True)

# correctness: one epi sweep vs eager posterior (f32 TPU, incl. the
# approx-reciprocal difference)
x_pad = pk.pad_matrix(jnp.asarray(x_np, jnp.float32))
swn_p, shn_p, xlog = pk.fused_pallas_raw(x_pad, *pk._pad_factors(
    w, h, x_pad.shape[0], x_pad.shape[1], rp_))
lw_p0, lh_p0 = pk._pad_factors(w, h, x_pad.shape[0], x_pad.shape[1],
                               rp_)
ehs0 = jnp.zeros((8, rp_), jnp.float32).at[0, :r].set(
    jnp.sum(h, axis=1))
out = ep.posterior_update_pallas(swn_p, shn_p, lw_p0, lh_p0, ehs0,
                                 jnp.stack(list(hyper)), fudge,
                                 n=n, m=m, r=r)
new, pending = posterior_update(w * swn_p[:n, :r], h * shn_p[:r, :m],
                                state, hyper, fudge, lgx)
for f in ["ew", "eh", "lw", "lh"]:
    got = np.asarray(out[f])
    got = got[:n, :r] if f in ("ew", "lw") else got[:r, :m]
    want = np.asarray(getattr(new, f))
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-20))
    print(f"epilogue {f}: max rel err vs eager {err:.2e}", flush=True)
