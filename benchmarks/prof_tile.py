"""Tile-kernel expansion-loop tuning probe (round 5, VERDICT item 9).

Measures the fused tile sweep rate at a 1/8-scale proxy of the
HBM-oversize config (same density, bm, kt selection; n halved,
m = 1/4) across candidate settings:

* _SLOT_GROUP in {2, 4, 8}          (scratch round-trip cadence)
* bn in {1024, 2048, 4096}          (gene-block height)
* int16 expansion accumulation      (2x VPU lane packing, packed
                                     slots only; off = f32 baseline)

Relative orderings transfer to the full oversize shape (expansion
work scales linearly in n*m at fixed density/kt); the winner is
confirmed on the real config by bench.bench_sparse_oversize.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp


def proxy_matrix(n=8192, m=278528, r=16, density=0.02, tile=32):
    rng = np.random.default_rng(0)
    mb = m // tile
    wf = rng.gamma(0.5, 1.0, (n, r)).astype(np.float32)
    hf = rng.gamma(0.5, 1.0, (r, mb)).astype(np.float32)
    scale = 2.0 * n * mb / float(wf.sum(axis=0) @ hf.sum(axis=1))
    chunks = []
    for i0 in range(0, n, 2048):
        mu = (wf[i0:i0 + 2048] @ hf) * scale
        blk = np.minimum(rng.poisson(mu), 127).astype(np.int16)
        blk *= rng.random(mu.shape) < density
        chunks.append(sps.csr_matrix(blk))
    base = sps.vstack(chunks).tocsr()
    return sps.hstack([base] * tile, format="csr")


def rate_for(x, n, m, r=16, k1=2, k2=12, reps=5):
    from ccfindr_tpu.ops import tile as tk
    from ccfindr_tpu.ops import vb as vb_ops
    from ccfindr_tpu.ops.vb import Hyper, VBState

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.gamma(1.0, 1.0, (n, r)), dtype)
    h = jnp.asarray(rng.gamma(1.0, 1.0, (r, m)), dtype)
    state = VBState(ew=w, eh=h, lw=w, lh=h, dw=jnp.zeros_like(w),
                    dh=jnp.zeros_like(h),
                    lkh=jnp.asarray(-jnp.inf, dtype))
    hyper = Hyper(*(jnp.asarray(1.0, dtype),) * 4)
    fudge = jnp.asarray(np.finfo(np.float32).eps, dtype)
    lgx = jnp.asarray(0.0, dtype)
    fused = tk.make_tile_fused()

    def body(xx, carry):
        st, hy = carry
        swn, shn, dterm = fused(xx, st.lw, st.lh)
        new, pending = vb_ops.posterior_update(
            st.lw * swn, st.lh * shn, st, hy, fudge, lgx)
        hy2, _ = vb_ops.hyper_update((True,) * 4, new, hy)
        return (new._replace(lkh=(pending + dterm)
                             / (float(n) * float(m))), hy2)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def sweep_k(xx, st, k):
        return jax.lax.fori_loop(0, k, lambda i, s: body(xx, s), st)

    # chained carry + value-fetch sync: block_until_ready can no-op
    # through the axon tunnel (see bench._sweep_rate round-5 notes);
    # only reading data reliably waits, and its fixed round-trip
    # cancels in the k2-k1 differencing
    def _sync(st):
        jax.block_until_ready(st)
        _ = np.asarray(jax.device_get(jax.tree.leaves(st)[0]))
        return st

    st = _sync(sweep_k(x, (state, hyper), k1))
    st = _sync(sweep_k(x, st, k2))
    b1 = b2 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = _sync(sweep_k(x, st, k1))
        t1 = time.perf_counter()
        st = _sync(sweep_k(x, st, k2))
        t2 = time.perf_counter()
        b1 = min(b1, t1 - t0)
        b2 = min(b2, t2 - t1)
    return (k2 - k1) / (b2 - b1)


def main():
    from ccfindr_tpu.ops import tile as tk

    full = proxy_matrix()
    n, m = full.shape
    print(f"proxy {n}x{m} nnz={full.nnz} "
          f"density={full.nnz / (n * m):.3f}", flush=True)

    for bn in (1024, 2048, 4096):
        x = tk.from_scipy_tile(full, bn=bn)
        print(f"bn={bn} bm={x.bm} kt={x.kt} packed={x.packed} "
              f"tail={len(x.trow)}", flush=True)
        for grp in (2, 4, 8):
            tk._SLOT_GROUP = grp
            jax.clear_caches()   # _SLOT_GROUP is a module global, not
            # a jit cache key — force retrace/recompile
            r = rate_for(x, n, m)
            print(f"  SLOT_GROUP={grp}: {r:.2f} sweeps/s", flush=True)
        del x


if __name__ == "__main__":
    main()
