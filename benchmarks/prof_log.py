"""Isolate the x*log(wth) cost in the fused kernel (real TPU).

All variants use u = xv * pl.reciprocal(wth, approx=True) and the
same 3 GEMMs; only the scalar-accumulator term varies:
  nolog   : acc += sum(u)
  log     : acc += sum(xv * jnp.log(wth))        (production)
  fastlog : acc += sum(xv * fast_log(wth))       (exponent+poly)

fast_log: log(x) = ln2 * (exponent + log2(mantissa)), mantissa poly
deg-5; valid for normal positive floats (wth > 0 always holds).
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

LN2 = 0.6931471805599453


def fast_log(v):
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    mbits = (bits & 0x007FFFFF) | (127 << 23)
    mant = jax.lax.bitcast_convert_type(mbits, jnp.float32)  # [1,2)
    t = mant - 1.0
    # deg-5 minimax-ish poly for log2(1+t), t in [0,1)
    acc = jnp.full_like(t, -0.034436006)
    for c in [0.18216566, -0.46490341, 0.70908645, -0.71960347,
              1.4426936]:
        acc = acc * t + c
    return (e.astype(jnp.float32) + acc * t) * LN2


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

        u = xv * pl.reciprocal(wth, approx=True)
        swn_ref[pl.ds(i * bn, bn), :] += jnp.dot(
            u, lhv.T, preferred_element_type=jnp.float32)
        shn_ref[...] += jnp.dot(lwv.T, u,
                                preferred_element_type=jnp.float32)
        if variant == "log":
            acc_ref[0, 0] += jnp.sum(xv * jnp.log(wth))
        elif variant == "fastlog":
            acc_ref[0, 0] += jnp.sum(xv * fast_log(wth))
        else:
            acc_ref[0, 0] += jnp.sum(u)
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


# fast_log accuracy (host check)
v = np.abs(rng.gamma(2.0, 3.0, 100000)).astype(np.float32) + 1e-6
fl = np.asarray(jax.jit(fast_log)(jnp.asarray(v)))
err = np.max(np.abs(fl - np.log(v)))
print(f"fast_log max abs err: {err:.2e}", flush=True)

ref_acc = None
for variant in ["log", "fastlog", "nolog"]:
    f = build(variant)
    swn, shn, acc = jax.block_until_ready(f(x, lw, lh))
    if variant == "log":
        ref_acc = float(acc[0, 0])
    if variant == "fastlog":
        print(f"  acc log={ref_acc:.6e} fastlog={float(acc[0,0]):.6e} "
              f"rel {abs(float(acc[0,0])-ref_acc)/abs(ref_acc):.2e}",
              flush=True)

    def body(i, c, f=f):
        lwc, lhc = c
        swn, shn, acc = f(x, lwc, lhc)
        return (lwc + 1e-30 * swn * acc[0, 0], lhc + 1e-30 * shn)

    t = timed(body, (lw, lh))
    print(f"{variant:8s}: {t:7.1f} us", flush=True)
