import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
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

def timed(f, carry, k1=64, k2=576, reps=3):
    f1 = jax.jit(lambda c: lax.fori_loop(0, k1, f, c))
    f2 = jax.jit(lambda c: lax.fori_loop(0, k2, f, c))
    jax.block_until_ready(f1(carry)); jax.block_until_ready(f2(carry))
    best = np.inf
    for _ in range(reps):
        t0=time.perf_counter(); jax.block_until_ready(f1(carry)); t1=time.perf_counter()
        jax.block_until_ready(f2(carry)); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/(k2-k1))
    return best*1e6

# A: kernel with honest cheap dependency (normalize by mean so values stay sane)
def body_a(i, c):
    lw, lh = c
    swn, shn, dterm = fused(x_pad, lw, lh)
    lw2 = lw * swn / jnp.mean(swn)
    lh2 = lh * shn / jnp.mean(shn) * (1.0 + 0.0 * dterm)
    return lw2, lh2
print("A kernel+minimal dep : %.1f us" % timed(body_a, (w, h)))

# B: kernel + full posterior
def body_b(i, c):
    st, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    st2, p2 = posterior_update(st.lw*swn, st.lh*shn, st, hyper, fudge, lgx)
    return st2, p2 + 0.0*dterm
print("B kernel+posterior   : %.1f us" % timed(body_b, (state, jnp.float32(0))))

# C: B + hyper every sweep
def body_c(i, c):
    st, hy, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    st2, p2 = posterior_update(st.lw*swn, st.lh*shn, st, hy, fudge, lgx)
    hy2, failed = hyper_update(mask, st2, hy)
    return st2, hy2, p2 + 0.0*dterm
print("C kernel+post+hyper  : %.1f us" % timed(body_c, (state, hyper, jnp.float32(0))))
