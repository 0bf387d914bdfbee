import time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.scipy.special import digamma, gammaln
from ccfindr_tpu.ops.vb import Hyper, VBState, posterior_update

n, m, r = 4096, 8192, 16
rng = np.random.default_rng(0)
sw = jnp.asarray(rng.gamma(2.0, 1.0, (n, r)), jnp.float32)
sh = jnp.asarray(rng.gamma(2.0, 1.0, (r, m)), jnp.float32)
w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                dh=jnp.zeros_like(h), lkh=jnp.asarray(-jnp.inf, jnp.float32))
hyper = Hyper(*(jnp.asarray(v, jnp.float32) for v in (1.0,1.0,1.0,1.0)))
fudge = jnp.asarray(np.finfo(np.float32).eps, jnp.float32)
lgx = jnp.asarray(1.0, jnp.float32)

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

def body_p(i, c):
    st, pend = c
    st2, p2 = posterior_update(sw + 1e-6*pend, sh, st, hyper, fudge, lgx)
    return st2, p2
print("posterior alone      : %.1f us" % timed(body_p, (state, jnp.float32(0))))

# special functions alone, same shapes/counts as posterior_update:
# digamma on (n,r)+(r,m), gammaln on (n,r)+(r,m)
def body_s(i, c):
    a, b = c
    a2 = digamma(a + 1.0) + gammaln(a + 1.0)
    b2 = digamma(b + 1.0) + gammaln(b + 1.0)
    return a2 - jnp.mean(a2) + a, b2 - jnp.mean(b2) + b
print("digamma+gammaln alone: %.1f us" % timed(body_s, (w, h)))

# elementwise-only variant: replace digamma/gammaln with log
def body_e(i, c):
    st, pend = c
    aw, bw, ah, bh = hyper
    alw = aw + sw + 1e-6*pend
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
    st2 = VBState(ew=ew, eh=eh, lw=lw, lh=lh, dw=dw, dh=dh, lkh=st.lkh)
    return st2, u1+u2+u3
print("posterior, log-only  : %.1f us" % timed(body_e, (state, jnp.float32(0))))
