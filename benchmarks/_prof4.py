import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.scipy.special import digamma, gammaln
from ccfindr_tpu.ops.vb import Hyper, VBState, posterior_update
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
lgx = jnp.asarray(1.0, jnp.float32)
x_pad = pk.pad_matrix(x)
fused = lambda xx, lw, lh: pk.fused_pallas_padded(
    xx, lw, lh, n=n, m=m, r=r, bn=pk.DEFAULT_BN, bm=pk.DEFAULT_BM)

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

# honest standalone posterior: sw/sh derived from evolving state
def body_p(i, c):
    st, pend = c
    sw = st.lw * 1.001 + 0.1
    sh = st.lh * 0.999 + 0.1
    st2, p2 = posterior_update(sw, sh, st, hyper, fudge, lgx)
    return st2, p2
print("posterior, varying   : %.1f us" % timed(body_p, (state, jnp.float32(0))))

# composed, but posterior uses cheap log instead of digamma/gammaln
def post_cheap(sw, sh, st, hy, fudge, lgx):
    aw, bw, ah, bh = hy
    alw = aw + sw
    bew = 1.0/(aw/bw + jnp.sum(st.eh, axis=1)[None,:])
    ew = alw*bew
    alh = ah + sh
    beh = 1.0/(ah/bh + jnp.sum(ew, axis=0)[:,None])
    eh = alh*beh
    lw = jnp.maximum(jnp.exp(jnp.log(alw))*bew, fudge)
    lh = jnp.maximum(jnp.exp(jnp.log(alh))*beh, fudge)
    dw = alw*bew**2; dh = alh*beh**2
    u1 = -jnp.dot(jnp.sum(ew,axis=0), jnp.sum(eh,axis=1)) - lgx
    u2 = jnp.sum(-(aw/bw)*ew + alw*(1.0+jnp.log(bew)) + jnp.log(alw))
    u3 = jnp.sum(-(ah/bh)*eh + alh*(1.0+jnp.log(beh)) + jnp.log(alh))
    return VBState(ew=ew, eh=eh, lw=lw, lh=lh, dw=dw, dh=dh, lkh=st.lkh), u1+u2+u3

def body_bc(i, c):
    st, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    st2, p2 = post_cheap(st.lw*swn, st.lh*shn, st, hyper, fudge, lgx)
    return st2, p2 + 0.0*dterm
print("composed, cheap post : %.1f us" % timed(body_bc, (state, jnp.float32(0))))

# composed with real posterior but NO u2/u3 scalar reductions
def post_nored(sw, sh, st, hy, fudge, lgx):
    aw, bw, ah, bh = hy
    alw = aw + sw
    bew = 1.0/(aw/bw + jnp.sum(st.eh, axis=1)[None,:])
    ew = alw*bew
    alh = ah + sh
    beh = 1.0/(ah/bh + jnp.sum(ew, axis=0)[:,None])
    eh = alh*beh
    lw = jnp.maximum(jnp.exp(digamma(alw))*bew, fudge)
    lh = jnp.maximum(jnp.exp(digamma(alh))*beh, fudge)
    dw = alw*bew**2; dh = alh*beh**2
    u1 = -jnp.dot(jnp.sum(ew,axis=0), jnp.sum(eh,axis=1)) - lgx
    return VBState(ew=ew, eh=eh, lw=lw, lh=lh, dw=dw, dh=dh, lkh=st.lkh), u1
def body_bn(i, c):
    st, pend = c
    swn, shn, dterm = fused(x_pad, st.lw, st.lh)
    st2, p2 = post_nored(st.lw*swn, st.lh*shn, st, hyper, fudge, lgx)
    return st2, p2 + 0.0*dterm
print("composed, no u2/u3   : %.1f us" % timed(body_bn, (state, jnp.float32(0))))
