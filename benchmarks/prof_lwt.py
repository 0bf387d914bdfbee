"""Transposed-W X-pass experiment (real TPU).

lw stored (n, r) lane-pads r=16 -> 128 physically, so each (bn, rp)
block DMA moves 8x its logical bytes and lw re-streams once per cell
tile: 64 steps x 512 KB = 32 MB/sweep of pure padding traffic.
Storing the W side transposed (rp, n) makes n the lane dim: 64 x 64 KB
= 4 MB.  Same GEMMs via dot_general (MXU handles transposed operands
natively).  Measures the current kernel vs the lwT variant.
"""
import functools
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

from ccfindr_tpu.ops.pallas import vb_kernels as pk

n, m, r = 4096, 8192, 16
bn, bm = 1024, 512
rng = np.random.default_rng(0)
x = jnp.asarray(rng.poisson(2.0, (n, m)).astype(np.float32))
lw = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), jnp.float32)
lh = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), jnp.float32)
rp_ = 16
lw_p, lh_p = pk._pad_factors(lw, lh, n, m, rp_)
lwt_p = lw_p.T.copy()  # (rp, np)


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


# baseline: current cm kernel
def body0(i, c):
    lwc, lhc = c
    swn, shn, xlog = pk.fused_pallas_raw(x, lwc, lhc)
    return (lwc + 1e-30 * swn * xlog, lhc + 1e-30 * shn)


print("current (n,r) layout : %7.1f us" % timed(body0, (lw_p, lh_p)),
      flush=True)


# transposed variant
def _kernel_t(x_ref, lwt_ref, lh_ref, swnt_ref, shn_ref, acc_ref):
    j = pl.program_id(0)
    i = pl.program_id(1)
    acc_t = jnp.float32
    lwt = lwt_ref[...]          # (rp, bn)
    lh = lh_ref[...]            # (rp, bm)
    xb = x_ref[...]
    wth = lax.dot_general(lwt, lh, (((0,), (0,)), ((), ())),
                          preferred_element_type=acc_t)   # (bn, bm)
    u = (xb * pl.reciprocal(wth, approx=True)).astype(jnp.float32)

    @pl.when((i == 0) & (j == 0))
    def _():
        swnt_ref[...] = jnp.zeros_like(swnt_ref)
        acc_ref[0, 0] = jnp.zeros((), acc_ref.dtype)

    @pl.when(i == 0)
    def _():
        shn_ref[...] = jnp.zeros_like(shn_ref)

    bn_ = lwt.shape[1]
    swnt_ref[:, pl.ds(i * bn_, bn_)] += lax.dot_general(
        lh, u, (((1,), (1,)), ((), ())),
        preferred_element_type=acc_t).astype(swnt_ref.dtype)
    shn_ref[...] += jnp.dot(lwt, u, preferred_element_type=acc_t
                            ).astype(shn_ref.dtype)
    acc_ref[0, 0] += jnp.sum(xb * jnp.log(wth)).astype(acc_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def fused_t(x_pad, lwt, lhp):
    np_, mp_ = x_pad.shape
    ni, nj = np_ // bn, mp_ // bm
    return pl.pallas_call(
        _kernel_t,
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((bn, bm), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bn), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rp_, np_), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp_, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp_, np_), jnp.float32),
            jax.ShapeDtypeStruct((rp_, mp_), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * np_ * mp_ * rp_,
            bytes_accessed=np_ * mp_ * 4,
            transcendentals=np_ * mp_,
        ),
    )(x_pad, lwt, lhp)


def body1(i, c):
    lwtc, lhc = c
    swnt, shn, xlog = fused_t(x, lwtc, lhc)
    return (lwtc + 1e-30 * swnt * xlog[0, 0], lhc + 1e-30 * shn)


print("transposed (r,n) W   : %7.1f us" % timed(body1, (lwt_p, lh_p)),
      flush=True)

# correctness: swnt == swn.T, shn equal
swn, shn, xl = pk.fused_pallas_raw(x, lw_p, lh_p)
swnt, shnt, xlt = fused_t(x, lwt_p, lh_p)
print("swn match:", float(jnp.max(jnp.abs(swnt - swn.T))),
      " shn match:", float(jnp.max(jnp.abs(shnt - shn))),
      " xlog match:", float(jnp.abs(xlt[0, 0] - xl)), flush=True)
