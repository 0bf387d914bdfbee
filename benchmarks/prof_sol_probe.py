"""Mosaic feature probe for the single-call 'sol' sweep kernel:
(a) scalar lax.while_loop inside a TPU Pallas kernel (+ nesting),
(b) phase-dependent index maps on a 1-D grid (X phase + epilogue
    phases), with outputs pinned during foreign phases,
(c) SMEM scalar accumulate + final-step derived writes.
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

# ---- probe (a): scalar while_loop (nested) in kernel ----------------


def _newton_kernel(x_ref, o_ref):
    a0 = x_ref[0, 0]

    def cond(c):
        it, a, done = c
        return (~done) & (it < 50)

    def body(c):
        it, a, _ = c
        d = (a * a - 2.0) / (2.0 * a)          # sqrt(2) Newton

        def hcond(dd):
            return a - dd <= 0

        def hbody(dd):
            return dd * 0.5

        d = lax.while_loop(hcond, hbody, d)    # nested positivity loop
        a1 = a - d
        return it + 1, a1, jnp.abs(1.0 - a1 / a) < 1e-6

    it, a, done = lax.while_loop(cond, body,
                                 (jnp.int32(0), a0, False))
    o_ref[0, 0] = a
    o_ref[0, 1] = it.astype(jnp.float32)


try:
    out = pl.pallas_call(
        _newton_kernel,
        in_specs=[pl.BlockSpec((1, 2), lambda: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 2), lambda: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
    )(jnp.asarray([[25.0, 0.0]], jnp.float32))
    print("probe a (nested scalar while): OK ->",
          np.asarray(out), flush=True)
except Exception as e:  # noqa: BLE001
    print("probe a FAIL:", str(e)[:300], flush=True)


# ---- probe (b)+(c): phased 1-D grid -------------------------------
# toy: grid = nx X-steps + ne epilogue steps; X phase accumulates
# column sums of x blocks into VMEM scratch; epilogue phase writes
# scratch*2 into the output blocks; last step writes a derived SMEM
# scalar.

n, m = 1024, 2048
bn, bm = 256, 512
ni, nj = n // bn, m // bm
nxy = ni * nj


def _phased_kernel(x_ref, y_ref, s_ref, acc):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        s_ref[0, 0] = jnp.zeros((), jnp.float32)

    @pl.when(t < nxy)
    def _():
        i = t % ni
        xb = x_ref[...]
        acc[pl.ds((t % ni) * bn, bn), :] += xb @ jnp.ones(
            (bm, 128), jnp.float32) * (1.0 + 0.0 * i)

    @pl.when(t >= nxy)
    def _():
        iw = t - nxy
        y_ref[...] = acc[pl.ds(iw * bn, bn), :] * 2.0
        s_ref[0, 0] += jnp.sum(acc[pl.ds(iw * bn, bn), :])


def x_idx(t):
    tc = jnp.minimum(t, nxy - 1)
    return (tc % ni, tc // ni)


def y_idx(t):
    return (jnp.where(t < nxy, 0, jnp.minimum(t - nxy, ni - 1)), 0)


try:
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(n, m)), jnp.float32)
    y, s = pl.pallas_call(
        _phased_kernel,
        grid=(nxy + ni,),
        in_specs=[pl.BlockSpec((bn, bm), x_idx,
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bn, 128), y_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((n, 128), jnp.float32)],
    )(x)
    want = (x @ np.ones((m, 128), np.float32)) * 2.0
    err = float(jnp.max(jnp.abs(y - want)))
    serr = abs(float(s[0, 0]) - float(np.sum(want)) / 2.0)
    print(f"probe b (phased grid): OK  maxerr={err:.2e} "
          f"scalar err={serr:.2e}", flush=True)
except Exception as e:  # noqa: BLE001
    print("probe b FAIL:", str(e)[:300], flush=True)
