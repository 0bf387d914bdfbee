import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from ccfindr_tpu.ops import vb as vb_ops
from ccfindr_tpu.ops.vb import Hyper, VBState, posterior_update, hyper_update
from ccfindr_tpu.ops.pallas import vb_kernels as pk

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
hf = rng.gamma(0.5, 1.0, (r, m)).astype(np.float32)
scale = 2.0 * n * m / float(wf.sum(axis=0) @ hf.sum(axis=1))
x = jnp.asarray(rng.poisson(wf @ hf * scale).astype(np.float32))
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                dh=jnp.zeros_like(h), lkh=jnp.asarray(-jnp.inf, jnp.float32))
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1.0,1.0,1.0,1.0)))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
lgx = jnp.sum(jax.scipy.special.gammaln(x + 1.0))
x_pad = pk.pad_matrix(x)
fused = lambda xx, lw, lh: pk.fused_pallas_padded(
    xx, lw, lh, n=n, m=m, r=r, bn=pk.DEFAULT_BN, bm=pk.DEFAULT_BM)
mask = (True, True, True, True)

def loop(body, carry, k):
    return lax.fori_loop(0, k, body, carry)

def timed(f, carry, k1=64, k2=576, reps=3):
    f1 = jax.jit(lambda c: loop(f, c, k1))
    f2 = jax.jit(lambda c: loop(f, c, k2))
    jax.block_until_ready(f1(carry)); jax.block_until_ready(f2(carry))
    best = np.inf
    for _ in range(reps):
        t0=time.perf_counter(); jax.block_until_ready(f1(carry)); t1=time.perf_counter()
        jax.block_until_ready(f2(carry)); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/(k2-k1))
    return best*1e6  # us per iter

# 1. fused kernel only
def body_k(i, c):
    st = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    return st._replace(lw=st.lw + 0*swn*dterm, lh=st.lh + 0*shn)
print("kernel only      : %.1f us" % timed(body_k, state))

# 2. kernel + posterior
def body_kp(i, c):
    st, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    sw = st.lw * swn; sh = st.lh * shn
    st2, pend2 = posterior_update(sw, sh, st, hyper, fudge, lgx)
    return st2, pend2 + 0*dterm
print("kernel+posterior : %.1f us" % timed(body_kp, (state, jnp.float32(0))))

# 3. + hyper update every sweep
def body_kph(i, c):
    st, hy, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    sw = st.lw * swn; sh = st.lh * shn
    st2, pend2 = posterior_update(sw, sh, st, hy, fudge, lgx)
    hy2, failed = hyper_update(mask, st2, hy)
    return st2, hy2, pend2 + 0*dterm
print("kernel+post+hyper: %.1f us" % timed(body_kph, (state, hyper, jnp.float32(0))))

# 4. hyper alone
def body_h(i, c):
    st, hy = c
    hy2, failed = hyper_update(mask, st, hy)
    return st._replace(lkh=st.lkh + 0*hy2.aw), hy2
print("hyper only       : %.1f us" % timed(body_h, (state, hyper)))
