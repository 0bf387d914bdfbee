"""Tile-kernel cost breakdown probe (round 5, VERDICT item 9).

The fused tile pass is ONE pallas_call — a device trace shows a single
op with no internal split.  This probe times VARIANT kernels with
components toggled off to attribute the per-sweep cost:

* full        — the production kernel body
* no_gemm     — expansion + recip only (swn/shn/wth skipped)
* no_expand   — GEMMs on a zero X tile (expansion loop skipped)
* no_xlog     — full minus the x*log(wth) transcendental
* interleave  — wth GEMM issued BETWEEN slot groups (does Mosaic
                overlap MXU and VPU work when the program order
                interleaves them?)

The kernel body is a copy of ops/tile.py:_tile_kernel with toggles —
deliberate probe scratch, not package code (the production kernel
stays single-source).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.prof_tile import proxy_matrix
from ccfindr_tpu.ops.pallas.vb_kernels import _recip_mul, _round_up
from ccfindr_tpu.ops import tile as tk

_SLOT_GROUP = 4


def _kernel(ni, nj, bn, bm, kt, mode, *refs):
    (cols_ref, lw_ref, lh_ref, do_ref,
     swn_ref, shn_ref, scal_ref, swn_s, xd_s) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)
    dt = lw_ref.dtype
    acc_t = jnp.float32

    @pl.when((j == 0) & (i == 0))
    def _():
        scal_ref[0, 0] = jnp.zeros((), acc_t)
        scal_ref[0, 1] = jnp.zeros((), acc_t)

    lw = lw_ref[...]
    lh = lh_ref[...]

    def expand():
        sl = cols_ref[...]
        cols = sl >> 16
        vals = (sl & 0xFFFF).astype(dt)
        ci = lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        xd_s[...] = jnp.zeros((bm, bn), dt)
        for k0 in range(0, kt, _SLOT_GROUP):
            acc = jnp.zeros((bm, bn), dt)
            for k in range(k0, min(k0 + _SLOT_GROUP, kt)):
                acc = acc + jnp.where(ci == cols[k:k + 1, :],
                                      vals[k:k + 1, :],
                                      jnp.zeros((), dt))
            xd_s[...] += acc

    def wth_gemm():
        return lax.dot_general(lh, lw, (((0,), (1,)), ((), ())),
                               preferred_element_type=acc_t)

    if mode == "no_expand":
        xd_s[...] = jnp.zeros((bm, bn), dt)
    elif mode == "interleave":
        # program-order interleave: half the slot groups, the wth
        # GEMM, the other half — exposes whether Mosaic co-schedules
        # the (independent) MXU work with the VPU expansion
        sl = cols_ref[...]
        cols = sl >> 16
        vals = (sl & 0xFFFF).astype(dt)
        ci = lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        xd_s[...] = jnp.zeros((bm, bn), dt)
        half = (kt // (2 * _SLOT_GROUP)) * _SLOT_GROUP
        for k0 in range(0, half, _SLOT_GROUP):
            acc = jnp.zeros((bm, bn), dt)
            for k in range(k0, min(k0 + _SLOT_GROUP, kt)):
                acc = acc + jnp.where(ci == cols[k:k + 1, :],
                                      vals[k:k + 1, :],
                                      jnp.zeros((), dt))
            xd_s[...] += acc
        wth = wth_gemm()
        for k0 in range(half, kt, _SLOT_GROUP):
            acc = jnp.zeros((bm, bn), dt)
            for k in range(k0, min(k0 + _SLOT_GROUP, kt)):
                acc = acc + jnp.where(ci == cols[k:k + 1, :],
                                      vals[k:k + 1, :],
                                      jnp.zeros((), dt))
            xd_s[...] += acc
    else:
        expand()

    xd = xd_s[...]

    if mode == "no_gemm":
        # keep a data dependence on xd so the loop isn't DCE'd
        shn_ref[...] = jnp.sum(xd).astype(dt) * jnp.ones_like(shn_ref)
        swn_ref[...] = jnp.zeros_like(swn_ref)
        return

    if mode != "interleave":
        wth = wth_gemm()
    safe = jnp.where(wth > 0, wth, 1.0).astype(dt)
    a = _recip_mul(xd, safe)

    if mode != "no_xlog":
        @pl.when(do_ref[0, 0] > 0)
        def _():
            xl = jnp.sum(jnp.where(xd > 0, xd * jnp.log(safe), 0.0)
                         .astype(acc_t))
            c0 = scal_ref[0, 1]
            s0 = scal_ref[0, 0]
            y = xl - c0
            t1 = s0 + y
            scal_ref[0, 1] = (t1 - s0) - y
            scal_ref[0, 0] = t1

    swn_c = lax.dot_general(a, lh, (((0,), (1,)), ((), ())),
                            preferred_element_type=acc_t
                            ).astype(swn_s.dtype)

    @pl.when(j == 0)
    def _():
        swn_s[pl.ds(i * bn, bn), :] = swn_c

    @pl.when(j > 0)
    def _():
        swn_s[pl.ds(i * bn, bn), :] += swn_c

    @pl.when(j == nj - 1)
    def _():
        swn_ref[...] = swn_s[pl.ds(i * bn, bn), :].astype(dt)

    shn_c = lax.dot_general(lw, a, (((0,), (1,)), ((), ())),
                            preferred_element_type=acc_t).astype(dt)

    @pl.when(i == 0)
    def _():
        shn_ref[...] = shn_c

    @pl.when(i > 0)
    def _():
        shn_ref[...] += shn_c


@functools.partial(jax.jit, static_argnames=("mode",))
def tile_pass(tc, lw_p, lh_p, mode):
    n_pad, rp = lw_p.shape
    m_pad = lh_p.shape[1]
    bn, bm, kt = tc.bn, tc.bm, tc.kt
    ni, nj = tc.ni, tc.nj
    dt = lw_p.dtype
    kernel = functools.partial(_kernel, ni, nj, bn, bm, kt, mode)
    do_arr = jnp.ones((1, 1), dt)
    slot_spec = pl.BlockSpec((kt, bn), lambda j, i: (j * ni + i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nj, ni),
        in_specs=[slot_spec,
                  pl.BlockSpec((bn, rp), lambda j, i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[
            pl.BlockSpec((bn, rp),
                         lambda j, i: (jnp.where(j == nj - 1, i, 0),
                                       0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, rp), dt),
                   jax.ShapeDtypeStruct((rp, m_pad), dt),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((n_pad, rp), jnp.float32),
                        pltpu.VMEM((bm, bn), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=tk._tile_vmem_budget(
                n_pad, bn, bm, kt, rp, jnp.dtype(dt))),
    )(tc.cols, lw_p, lh_p, do_arr)


def main():
    full = proxy_matrix()
    n, m = full.shape
    x = tk.from_scipy_tile(full)
    print(f"proxy {n}x{m} nnz={full.nnz} bn={x.bn} bm={x.bm} "
          f"kt={x.kt} packed={x.packed}", flush=True)
    r = 16
    rp = _round_up(r, 8)
    rng = np.random.default_rng(0)
    lw_p = tk._pad_lw(jnp.asarray(rng.gamma(1.0, 1.0, (n, r)),
                                  jnp.float32), x.ni * x.bn, rp)
    lh_p = tk._pad_lh(jnp.asarray(rng.gamma(1.0, 1.0, (r, m)),
                                  jnp.float32), x.nj * x.bm, rp)

    @functools.partial(jax.jit, static_argnames=("mode", "k"))
    def sweep_k(tc, lw, lh, mode, k):
        def body(i, carry):
            clw, clh = carry
            swn, shn, scal = tile_pass(tc, clw, clh, mode)
            # couple outputs back with a BIT-VISIBLE bounded drift:
            # a 1e-30*swn coupling underflows against O(1) factors,
            # leaving the carry bitwise unchanged — and the axon
            # stack serves repeated (executable, identical-content
            # args) dispatches from a cache without executing
            return (clw + 1e-4 * jnp.sign(swn),
                    clh + 1e-4 * jnp.sign(shn))
        lw2, lh2 = lax.fori_loop(0, k, body, (lw, lh))
        return lw2, lh2

    # chained carry + VALUE-FETCH sync: through the axon tunnel,
    # block_until_ready can return ~0.2 ms without the execution
    # having run (round-5 discovery, bench._sweep_rate notes); only
    # reading data reliably waits, and the fixed fetch round-trip
    # cancels in the k2-k1 differencing
    def timed(mode, k, lw, lh):
        t0 = time.perf_counter()
        lw2, lh2 = sweep_k(x, lw, lh, mode, k)
        _ = float(jnp.sum(lw2[0]))
        return time.perf_counter() - t0, lw2, lh2

    for mode in ("full", "no_xlog", "no_gemm", "no_expand",
                 "interleave"):
        k1, k2 = 2, 12
        _, lw2, lh2 = timed(mode, k1, lw_p, lh_p)   # compile + warm
        _, lw2, lh2 = timed(mode, k2, lw2, lh2)
        b1 = b2 = float("inf")
        for _ in range(5):
            d1, lw2, lh2 = timed(mode, k1, lw2, lh2)
            d2, lw2, lh2 = timed(mode, k2, lw2, lh2)
            b1 = min(b1, d1)
            b2 = min(b2, d2)
        dt_pass = (b2 - b1) / (k2 - k1)
        print(f"{mode:11s}: {dt_pass * 1e3:8.2f} ms/pass "
              f"({1.0 / dt_pass:7.2f} passes/s)  "
              f"[b1={b1:.4f}s b2={b2:.4f}s]", flush=True)


if __name__ == "__main__":
    main()
