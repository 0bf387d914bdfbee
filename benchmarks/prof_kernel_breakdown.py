"""Break down the fused VB sweep kernel's on-chip cost (real TPU).

Variants of the cell-major fused kernel at n=4096 m=8192 r=16 f32:
  A. full kernel        (3 GEMMs + divide + x*log(wth))
  B. no xlog            (3 GEMMs + divide)
  C. no divide          (3 GEMMs, u = x*wth)
  D. 1 GEMM only        (wth + pass x through a sum)  ~ X-stream floor

Also: does digamma / lgamma / exp lower inside a Pallas TPU kernel?

Usage: python benchmarks/prof_kernel_breakdown.py
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


def make_kernel(variant):
    def kern(x_ref, lw_ref, lh_ref, swn_ref, shn_ref, acc_ref):
        j = pl.program_id(0)
        i = pl.program_id(1)
        acc_t = jnp.float32
        lwv = lw_ref[...]
        lhv = lh_ref[...]
        xv = x_ref[...]
        wth = jnp.dot(lwv, lhv, preferred_element_type=acc_t)

        @pl.when((i == 0) & (j == 0))
        def _():
            swn_ref[...] = jnp.zeros_like(swn_ref)
            acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

        @pl.when(i == 0)
        def _():
            shn_ref[...] = jnp.zeros_like(shn_ref)

        if variant == "D":
            swn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
                xv, lhv.T, preferred_element_type=acc_t)
            acc_ref[0, 0] += jnp.sum(wth)
            return
        if variant == "C":
            u = xv * wth
        else:
            u = xv / wth
        swn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
            u, lhv.T, preferred_element_type=acc_t)
        shn_ref[...] += jnp.dot(lwv.T, u, preferred_element_type=acc_t)
        if variant == "A":
            acc_ref[0, 0] += jnp.sum(xv * jnp.log(wth))
        else:
            acc_ref[0, 0] += jnp.sum(u)
    return kern


def run_variant(variant):
    ni, nj = n // bn, m // bm
    f = pl.pallas_call(
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
    return f


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


for v in ["A", "B", "C", "D"]:
    f = run_variant(v)

    def body(i, c, f=f):
        lwc, lhc = c
        swn, shn, acc = f(x, lwc, lhc)
        # feed outputs back so nothing is DCE'd / overlapped away
        return (lwc + 1e-30 * swn * acc[0, 0],
                lhc + 1e-30 * shn)

    t = timed(body, (lw, lh))
    print(f"variant {v}: {t:7.1f} us", flush=True)

# --- do transcendentals lower in Pallas TPU? -------------------------
for name, fn in [("exp", jnp.exp), ("log", jnp.log),
                 ("digamma", jax.scipy.special.digamma),
                 ("lgamma", jax.scipy.special.gammaln)]:
    def tk(x_ref, o_ref, fn=fn):
        o_ref[...] = fn(x_ref[...])
    try:
        out = pl.pallas_call(
            tk, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        )(jnp.abs(lw[:256, :16]) @ jnp.ones((16, 256), jnp.float32)
          + 0.5)
        ref = fn(jnp.abs(lw[:256, :16]) @ jnp.ones((16, 256),
                                                   jnp.float32) + 0.5)
        err = float(jnp.max(jnp.abs(out - ref)
                            / (jnp.abs(ref) + 1e-6)))
        print(f"pallas {name}: OK  max rel err {err:.2e}", flush=True)
    except Exception as e:
        print(f"pallas {name}: FAIL {type(e).__name__}: "
              f"{str(e)[:100]}", flush=True)
