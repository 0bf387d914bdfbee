"""Is the f32 divide the fused kernel's hidden cost?  (real TPU)

Same cell-major fused kernel (3 GEMMs + u + x*log(wth)), varying only
how u = x/wth is computed:
  div    : xv / wth                      (current production)
  recip  : xv * pl.reciprocal(wth)       (exact)
  approx : xv * pl.reciprocal(wth, approx=True)
  newton : xv * (approx refined w/ one Newton step)
  mul    : xv * wth                      (floor; wrong math)

Prints per-variant time and max |u - x/wth| / |x/wth| on one tile.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

n, m, r = 4096, 8192, 16
bn, bm, rp = 1024, 512, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.poisson(2.0, (n, m)).astype(np.float32))
lw = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
lh = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)


def _u(variant, xv, wth):
    if variant == "div":
        return xv / wth
    if variant == "recip":
        return xv * pl.reciprocal(wth, approx=False)
    if variant == "approx":
        return xv * pl.reciprocal(wth, approx=True)
    if variant == "newton":
        inv = pl.reciprocal(wth, approx=True)
        inv = inv * (2.0 - wth * inv)
        return xv * inv
    return xv * wth


def make_kernel(variant):
    def kern(x_ref, lw_ref, lh_ref, swn_ref, shn_ref, acc_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        lwv = lw_ref[...]
        lhv = lh_ref[...]
        xv = x_ref[...]
        wth = jnp.dot(lwv, lhv, preferred_element_type=jnp.float32)

        @pl.when((i == 0) & (j == 0))
        def _():
            swn_ref[...] = jnp.zeros_like(swn_ref)
            acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

        @pl.when(i == 0)
        def _():
            shn_ref[...] = jnp.zeros_like(shn_ref)

        u = _u(variant, xv, wth)
        swn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
            u, lhv.T, preferred_element_type=jnp.float32)
        shn_ref[...] += jnp.dot(lwv.T, u,
                                preferred_element_type=jnp.float32)
        acc_ref[0, 0] += jnp.sum(xv * jnp.log(wth))
    return kern


def build(variant):
    ni, nj = n // bn, m // bm
    return pl.pallas_call(
        make_kernel(variant),
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, rp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, rp), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, rp), jnp.float32),
            jax.ShapeDtypeStruct((rp, m), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )


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


ref_swn = None
for v in ["div", "recip", "approx", "newton", "mul"]:
    f = build(v)
    swn, shn, acc = jax.block_until_ready(f(x, lw, lh))
    if v == "div":
        ref_swn, ref_shn = np.asarray(swn), np.asarray(shn)
        err = 0.0
    else:
        err = max(
            float(np.max(np.abs(np.asarray(swn) - ref_swn)
                         / (np.abs(ref_swn) + 1e-6))),
            float(np.max(np.abs(np.asarray(shn) - ref_shn)
                         / (np.abs(ref_shn) + 1e-6))))

    def body(i, c, f=f):
        lwc, lhc = c
        swn, shn, acc = f(x, lwc, lhc)
        return (lwc + 1e-30 * swn * acc[0, 0], lhc + 1e-30 * shn)

    t = timed(body, (lw, lh))
    print(f"{v:7s}: {t:7.1f} us   rel err vs div: {err:.2e}",
          flush=True)
