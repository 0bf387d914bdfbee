"""Tile-sparse layout + Pallas kernel: the sparse capacity path.

The dual-ELL backend (ops/ell.py) is gather-only, but its XLA gathers
fetch an (8, 128) VMEM granule per indexed row — ~50x below streaming
bandwidth at per-nonzero granularity (BASELINE.md sparse decision
table; measured 119 sweeps/s vs 8,500+ dense at 10% density).  This
module removes the gathers entirely:

* **Layout** (:class:`TileCounts`, built once on host): the matrix is
  cut into (bn, bm) tiles; within each tile every gene row stores its
  nonzeros as fixed-width slots of (LOCAL column, value).  Row
  identity is the array index (no scatter), and the column index is
  bounded by ``bm`` (small compare region).  Slots beyond the static
  width go to a COO overflow tail (a few % of nnz, handled by the
  existing XLA scan).
* **Kernel** (one ``pallas_call``, grid = cell-tiles x gene-tiles):
  each step expands its slot block into a dense (bn, bm) X tile in
  VMEM/VREGs — a static unrolled loop of lane-iota compares, ~bm VPU
  ops per nonzero, no gather and no scatter — then runs the SAME
  dense fused math as the production kernel: wth = lw @ lh on the
  MXU, a = x/wth, swn/shn contractions, and the ELBO's x*log(wth).
  ``swn`` accumulates in a VMEM scratch across cell tiles (cell-tile
  axis outermost); ``shn`` accumulates directly in its revisited
  output block; the scalar ELBO term accumulates in SMEM with Kahan
  compensation (thousands of tile partials at atlas scale).

Cost model vs the alternatives (why this wins on TPU): the expansion
pays O(bm) VPU ops per nonzero ONCE and then gets all three rank-r
contractions at dense-MXU speed; a slot gather pays the same order in
*memory latency* per nonzero for EACH of the two passes, and a
one-hot-matmul gather/scatter costs 4*nnz*r*(bn+bm) MXU flops — an
order of magnitude more than the dense tile GEMMs below ~25% density.

Like every sparse backend here, this exists for **memory capacity**
(atlas matrices whose dense-int8 image exceeds HBM; see BASELINE.md):
element sparsity cannot beat dense MXU tiles at scRNA densities when
X fits.

Reference semantics: sufficient statistics and ELBO data term of
src/vbnmf_update.cpp:33-36,67-90 (VB) and the Lee-Seung numerators of
R/factorize.R:2-27 (ML), computed over nonzeros only.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ell import _tail_scan
from .pallas.vb_kernels import _interpret, _recip_mul, _round_up


class TileCounts(NamedTuple):
    """Tile-sparse count matrix (pytree; dims static).

    ``cols``/``vals``: (ni*nj*kt, bn) slot arrays — row-block
    ``b = j*ni + i`` holds tile (gene-block i, cell-block j); row
    ``b*kt + k`` lane ``g % bn`` is the k-th nonzero of gene g in
    that tile, as LOCAL cell index (``c % bm``) and value; padding
    slots are (0, 0).  The slot axis rides SUBLANES and the gene axis
    rides LANES: a (rows, kt) layout would be lane-padded to 128 on
    device (TPU HBM arrays tile at T(8,128)), a 10x memory blowup at
    kt~12 — measured as a 36 GB allocation for a 3.4 GB array.
    ``trow/tcol/tval``: flat COO overflow tail (global indices) for
    slots beyond ``kt``.

    ``packed`` (static): integer counts < 65536 with bm <= 32768 pack
    each slot's (local col, value) into ONE int32
    (``col << 16 | val``) in ``cols`` — halving the layout's HBM
    footprint and stream, the dominant device memory at capacity
    scale; ``vals`` is then a (0, 0) placeholder.  Unpacking is two
    VPU ops per slot block inside the kernel.
    """
    cols: jax.Array          # (ni*nj*kt, bn) int32 (packed: col|val)
    vals: jax.Array          # (ni*nj*kt, bn) float; (0, 0) if packed
    trow: jax.Array          # (t,) int32 overflow tail
    tcol: jax.Array          # (t,) int32
    tval: jax.Array          # (t,) float
    n: int
    m: int
    bn: int
    bm: int
    kt: int
    packed: bool

    @property
    def ni(self) -> int:
        return _round_up(self.n, self.bn) // self.bn

    @property
    def nj(self) -> int:
        return _round_up(self.m, self.bm) // self.bm

    @property
    def val(self):
        """Every nonzero value exactly once (padding is 0) — feeds the
        hoisted ``sum lgamma(x+1)`` in ops.vb.vb_run."""
        if self.packed:
            main = (self.cols & 0xFFFF).astype(self.tval.dtype)
        else:
            main = self.vals
        return jnp.concatenate([main.ravel(), self.tval.ravel()])


def _tc_flatten(tc):
    return (tc.cols, tc.vals, tc.trow, tc.tcol, tc.tval), \
        (tc.n, tc.m, tc.bn, tc.bm, tc.kt, tc.packed)


def _tc_unflatten(aux, children):
    return TileCounts(*children, *aux)


jax.tree_util.register_pytree_node(TileCounts, _tc_flatten,
                                   _tc_unflatten)


def _pick_blocks(n, m, bn, bm, density=None):
    """Default blocks, tuned on v5e (BASELINE.md rounds 4-5): the
    expansion loop costs ~kt*bn*bm VPU ops per tile ~ (kt/density)
    per nonzero, so the narrowest cell block (128 lanes) minimizes
    slot padding; a tall gene block amortizes per-tile fixed costs
    (round-4 scan at the 10%-density bench shape: 1697 sweeps/s at
    bn=2048, 1554 at bn=1024, 1127 at bn=512/bm=512; round-5 scan at
    the 2%-density oversize proxy: 35.6 sweeps/s at bn=4096, 32.4 at
    bn=2048, 26.6 at bn=1024 — and bn=8192 exceeds the 100 MB scoped
    VMEM budget, _tile_vmem_budget)."""
    del density
    if bn is None:
        bn = min(4096, _round_up(n, 8))
    if bm is None:
        bm = min(128, _round_up(m, 128))
    return bn, bm


def _pick_width(cnts, quantile, kt_cap):
    """Static slot width from the nonempty per-(row, tile) counts —
    a multiple of 8 (the (kt, bn) device blocks put slots on
    sublanes; f32/int32 sublane tiling is 8)."""
    if len(cnts) == 0:
        return 8
    w = (int(np.quantile(cnts, quantile)) if quantile < 1.0
         else int(cnts.max()))
    return int(min(_round_up(kt_cap, 8), max(8, _round_up(w, 8))))


def _build_slots(rows, cols_g, data, n, m, bn, bm, kt, np_dtype,
                 tile_j=None):
    """Fill the (ni*nj*kt, bn) transposed slot arrays + overflow tail
    from COO triplets sorted by (row, tile_j, col) — CSR order
    qualifies."""
    ni = _round_up(n, bn) // bn
    nj = _round_up(m, bm) // bm
    nnz = len(rows)
    nb = ni * nj
    cols_arr = np.zeros((nb * kt, bn), np.int32)
    vals_arr = np.zeros((nb * kt, bn), np_dtype)
    if nnz == 0:
        z = np.zeros(0)
        return (cols_arr, vals_arr, z.astype(np.int32),
                z.astype(np.int32), z.astype(np_dtype))
    if tile_j is None:
        tile_j = cols_g // bm
    keys = rows.astype(np.int64) * nj + tile_j
    change = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.nonzero(change)[0]
    gid = np.cumsum(change) - 1
    pos = np.arange(nnz) - starts[gid]
    main = pos < kt
    b = tile_j * ni + rows // bn
    flat = b * kt + pos                    # (tile, slot) row
    lane = rows % bn                       # gene lane
    cols_arr[flat[main], lane[main]] = cols_g[main] % bm
    vals_arr[flat[main], lane[main]] = data[main]
    tail = ~main
    return (cols_arr, vals_arr, rows[tail].astype(np.int32),
            cols_g[tail].astype(np.int32), data[tail].astype(np_dtype))


def _can_pack(data, bm, pack):
    if pack is False:
        return False
    if bm > 32768:
        return False
    if data.size == 0:
        return True
    return bool(np.all(data == np.floor(data)) and data.min() > 0
                and data.max() < 65536)


def _pack_slots(cols_arr, vals_arr, np_dtype):
    packed = (cols_arr.astype(np.int32) << 16) \
        | vals_arr.astype(np.int32)
    return packed, np.zeros((0, 0), np_dtype)


def from_scipy_tile(mat, dtype=jnp.float32, bn: int | None = None,
                    bm: int | None = None, quantile: float = 0.99,
                    kt_cap: int = 64, pack="auto") -> TileCounts:
    """Build the tile-sparse layout from a scipy sparse (or dense)
    matrix.  Done once per factorization on host.

    ``quantile`` sets the static slot width from the per-(gene, tile)
    nonzero-count distribution; entries beyond it overflow to the COO
    tail (tests shrink it to exercise tails on tiny matrices).
    ``kt_cap`` bounds the width (the kernel unrolls the slot loop).
    ``pack='auto'`` packs (col, value) slots into one int32 whenever
    the counts are integers < 65536 (see TileCounts.packed).
    """
    import scipy.sparse as sp

    csr = sp.csr_matrix(mat)
    csr.sum_duplicates()
    csr.eliminate_zeros()
    n, m = csr.shape
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    bn, bm = _pick_blocks(n, m, bn, bm,
                          density=csr.nnz / max(1, n * m))

    coo = csr.tocoo()
    rows = coo.row.astype(np.int64)
    cols_g = coo.col.astype(np.int64)
    tile_j = cols_g // bm
    # per-(row, tile) counts via unique key counting (CSR order makes
    # the groups contiguous)
    keys = rows * (_round_up(m, bm) // bm) + tile_j
    change = np.r_[True, keys[1:] != keys[:-1]] if len(keys) else \
        np.zeros(0, bool)
    starts = np.nonzero(change)[0]
    cnts = np.diff(np.r_[starts, len(keys)])
    kt = _pick_width(cnts, quantile, kt_cap)

    cols_arr, vals_arr, trow, tcol, tval = _build_slots(
        rows, cols_g, coo.data, n, m, bn, bm, kt, np_dtype,
        tile_j=tile_j)
    packed = _can_pack(coo.data, bm, pack)
    if packed:
        cols_arr, vals_arr = _pack_slots(cols_arr, vals_arr, np_dtype)
    j = jnp.asarray
    return TileCounts(cols=j(cols_arr), vals=j(vals_arr),
                      trow=j(trow), tcol=j(tcol), tval=j(tval),
                      n=n, m=m, bn=bn, bm=bm, kt=kt, packed=packed)


def from_dense_tile(x, dtype=jnp.float32, **kw) -> TileCounts:
    import scipy.sparse as sp

    return from_scipy_tile(sp.csr_matrix(np.asarray(x)), dtype=dtype,
                           **kw)


def from_scipy_tile_sharded(mat, n_shards: int,
                            m_pad: int | None = None,
                            dtype=jnp.float32, bn: int | None = None,
                            bm: int | None = None,
                            quantile: float = 0.99,
                            kt_cap: int = 64,
                            pack="auto") -> TileCounts:
    """Cell-sharded tile layout: one shard's nonzeros per device.

    Every leaf carries a leading ``n_shards`` axis (laid out over the
    mesh's 'cells' axis); ``m`` is the LOCAL cell count and column
    indices are local to the shard.  Block sizes, slot width, and tail
    lengths are computed globally so all shards share static shapes.
    Collective pattern: parallel.sharded.make_tile_fused_sharded
    (psum of the n x r swn partial + scalar ELBO term; shn local).
    """
    import scipy.sparse as sp

    csc = sp.csc_matrix(mat)
    csc.sum_duplicates()
    csc.eliminate_zeros()
    n, m = csc.shape
    if m_pad is None:
        m_pad = -(-m // n_shards) * n_shards
    if m_pad % n_shards != 0:
        raise ValueError(f"m_pad={m_pad} not divisible by {n_shards}")
    m_loc = m_pad // n_shards
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)
    bn, bm = _pick_blocks(n, m_loc, bn, bm,
                          density=csc.nnz / max(1, n * m))

    shards = []
    for s in range(n_shards):
        j0, j1 = s * m_loc, min((s + 1) * m_loc, m)
        blk = sp.coo_matrix(sp.csr_matrix(csc[:, j0:max(j1, j0)]))
        shards.append((blk.row.astype(np.int64),
                       blk.col.astype(np.int64), blk.data))

    # global static width from all shards' per-(row, tile) counts
    nj = _round_up(m_loc, bm) // bm
    all_cnts = []
    for rows, cols_g, _ in shards:
        keys = rows * nj + cols_g // bm
        if len(keys):
            change = np.r_[True, keys[1:] != keys[:-1]]
            starts = np.nonzero(change)[0]
            all_cnts.append(np.diff(np.r_[starts, len(keys)]))
    kt = _pick_width(np.concatenate(all_cnts) if all_cnts
                     else np.zeros(0), quantile, kt_cap)

    parts = [_build_slots(rows, cols_g, data, n, m_loc, bn, bm, kt,
                          np_dtype)
             for rows, cols_g, data in shards]
    t = max(len(p[2]) for p in parts)
    packed = _can_pack(csc.data, bm, pack)

    def _pad_tail(tr, tc, tv):
        pad = t - len(tr)
        # dummy (n, m_loc) hits the zero row of both extended tables
        return (np.concatenate([tr, np.full(pad, n, np.int32)]),
                np.concatenate([tc, np.full(pad, m_loc, np.int32)]),
                np.concatenate([tv, np.zeros(pad, np_dtype)]))

    st = {f: [] for f in ("cols", "vals", "trow", "tcol", "tval")}
    for cols_arr, vals_arr, tr, tc, tv in parts:
        if packed:
            cols_arr, vals_arr = _pack_slots(cols_arr, vals_arr,
                                             np_dtype)
        tr, tc, tv = _pad_tail(tr, tc, tv)
        for f, a in (("cols", cols_arr), ("vals", vals_arr),
                     ("trow", tr), ("tcol", tc), ("tval", tv)):
            st[f].append(a)
    j = jnp.asarray
    return TileCounts(**{f: j(np.stack(v)) for f, v in st.items()},
                      n=n, m=m_loc, bn=bn, bm=bm, kt=kt,
                      packed=packed)


# ---------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------

# slots accumulated per VMEM-scratch round-trip in the densify loop
# (bounds Mosaic's live temporaries at ~_SLOT_GROUP (bn, bm) buffers
# while amortizing the scratch load/store)
_SLOT_GROUP = 4


def _tile_kernel(ni, nj, bn, bm, kt, packed, want_swn, want_shn,
                 want_xlog, mxu_bf16, *refs):
    if packed:
        (cols_ref, lw_ref, lh_ref, do_ref,
         swn_ref, shn_ref, scal_ref, swn_s, xd_s) = refs
    else:
        (cols_ref, vals_ref, lw_ref, lh_ref, do_ref,
         swn_ref, shn_ref, scal_ref, swn_s, xd_s) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)
    dt = lw_ref.dtype
    acc_t = jnp.promote_types(dt, jnp.float32)

    @pl.when((j == 0) & (i == 0))
    def _():
        scal_ref[0, 0] = jnp.zeros((), acc_t)
        scal_ref[0, 1] = jnp.zeros((), acc_t)

    # ---- expand the slot block to a dense TRANSPOSED X tile
    # Xd^T (bm, bn): cells on sublanes, genes on lanes (VPU; no
    # gather, no scatter — the gene is the lane index, the cell via
    # sublane-iota compare).  Everything downstream works in this
    # transposed tile space, so no in-kernel transposes exist.
    # The unrolled slot loop accumulates INTO VMEM SCRATCH every
    # ``_SLOT_GROUP`` slots: routing groups through memory bounds
    # Mosaic's register/VMEM liveness to one group's temporaries (a
    # pure-value unroll kept every iteration's (bm, bn) buffers live
    # and overflowed scoped VMEM).
    if packed:
        sl = cols_ref[...]                             # (kt, bn)
        cols = sl >> 16                 # col in high bits, val >= 1
        vals = (sl & 0xFFFF).astype(dt)
    else:
        vals = vals_ref[...].astype(dt)                # (kt, bn)
        cols = cols_ref[...]                           # (kt, bn)
    ci = lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    xd_s[...] = jnp.zeros((bm, bn), dt)
    for k0 in range(0, kt, _SLOT_GROUP):
        acc = jnp.zeros((bm, bn), dt)
        for k in range(k0, min(k0 + _SLOT_GROUP, kt)):
            acc = acc + jnp.where(ci == cols[k:k + 1, :],
                                  vals[k:k + 1, :], jnp.zeros((), dt))
        xd_s[...] += acc
    xd = xd_s[...]                                     # X^T tile

    # ---- dense fused math on the transposed tile (MXU) --------------
    # mxu_bf16 (opt-in, precision='bf16'): pre-cast the three GEMMs'
    # operands to bf16 in VREGs (f32 accumulation) — same trade as the
    # dense sol path (the MXU already truncates f32 operands to 1-pass
    # bf16; the win is halved operand feed)
    mt = jnp.bfloat16 if mxu_bf16 else dt
    lw = lw_ref[...]                                   # (bn, rp)
    lh = lh_ref[...]                                   # (rp, bm)
    lw_m = lw.astype(mt)
    lh_m = lh.astype(mt)
    # wth^T[c, g] = sum_r lh[r, c] * lw[g, r]
    wth = lax.dot_general(lh_m, lw_m, (((0,), (1,)), ((), ())),
                          preferred_element_type=acc_t)   # (bm, bn)
    safe = jnp.where(wth > 0, wth, 1.0).astype(dt)
    a = _recip_mul(xd, safe)                           # 0 where xd=0
    a_m = a.astype(mt)

    if want_xlog:
        # dynamic skip (elbo_every cadence): the O(nnz) x*log(wth)
        # transcendental only runs on ELBO-check sweeps
        @pl.when(do_ref[0, 0] > 0)
        def _():
            xl = jnp.sum(jnp.where(xd > 0, xd * jnp.log(safe), 0.0)
                         .astype(acc_t))
            # Kahan-compensated SMEM accumulation: atlas grids sum
            # tens of thousands of tile partials (SURVEY §7.3)
            c0 = scal_ref[0, 1]
            s0 = scal_ref[0, 0]
            y = xl - c0
            t1 = s0 + y
            scal_ref[0, 1] = (t1 - s0) - y
            scal_ref[0, 0] = t1

    if want_swn:
        # swn[g, r] = sum_c a^T[c, g] * lh[r, c]
        swn_c = lax.dot_general(a_m, lh_m, (((0,), (1,)), ((), ())),
                                preferred_element_type=acc_t
                                ).astype(swn_s.dtype)   # (bn, rp)

        @pl.when(j == 0)
        def _():
            swn_s[pl.ds(i * bn, bn), :] = swn_c

        @pl.when(j > 0)
        def _():
            swn_s[pl.ds(i * bn, bn), :] += swn_c

        @pl.when(j == nj - 1)
        def _():
            swn_ref[...] = swn_s[pl.ds(i * bn, bn), :].astype(dt)
    else:
        @pl.when(j == nj - 1)
        def _():
            swn_ref[...] = jnp.zeros_like(swn_ref)

    if want_shn:
        # shn[r, c] = sum_g lw[g, r] * a^T[c, g]
        shn_c = lax.dot_general(lw_m, a_m, (((0,), (1,)), ((), ())),
                                preferred_element_type=acc_t
                                ).astype(dt)            # (rp, bm)

        @pl.when(i == 0)
        def _():
            shn_ref[...] = shn_c

        @pl.when(i > 0)
        def _():
            shn_ref[...] += shn_c
    else:
        @pl.when(i == 0)
        def _():
            shn_ref[...] = jnp.zeros_like(shn_ref)


@functools.partial(jax.jit,
                   static_argnames=("want", "mxu_bf16"))
def _tile_pass(tc: TileCounts, lw_p, lh_p, want=(True, True, True),
               do_elbo=None, mxu_bf16=False):
    """One pass over the tiles: (swn (n_pad, rp), shn (rp, m_pad),
    scal (1, 2)) from padded factors.  ``want`` statically disables
    unused outputs (ML phases need only one side); ``do_elbo``
    (dynamic scalar, default on) skips the xlog transcendental on
    non-ELBO-check sweeps; ``mxu_bf16`` pre-casts GEMM operands."""
    n_pad, rp = lw_p.shape
    m_pad = lh_p.shape[1]
    bn, bm, kt = tc.bn, tc.bm, tc.kt
    ni, nj = tc.ni, tc.nj
    dt = lw_p.dtype
    acc_t = jnp.promote_types(dt, jnp.float32)

    kernel = functools.partial(_tile_kernel, ni, nj, bn, bm, kt,
                               tc.packed, *(bool(w) for w in want),
                               bool(mxu_bf16))
    if do_elbo is None:
        do_elbo = jnp.ones((), dt)
    do_arr = jnp.asarray(do_elbo, dt).reshape(1, 1)
    grid = (nj, ni)
    slot_spec = pl.BlockSpec((kt, bn), lambda j, i: (j * ni + i, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [slot_spec] + ([] if tc.packed else [slot_spec]) + [
        pl.BlockSpec((bn, rp), lambda j, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    ins = ([tc.cols] if tc.packed else [tc.cols, tc.vals]) \
        + [lw_p, lh_p, do_arr]
    swn, shn, scal = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bn, rp),
                         lambda j, i: (jnp.where(j == nj - 1, i, 0),
                                       0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bm), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, rp), dt),
            jax.ShapeDtypeStruct((rp, m_pad), dt),
            jax.ShapeDtypeStruct((1, 2), acc_t),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, rp), acc_t),
            pltpu.VMEM((bm, bn), dt),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * n_pad * m_pad * rp,
            bytes_accessed=int(tc.cols.size) * (4 + dt.itemsize),
            transcendentals=n_pad * m_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_tile_vmem_budget(n_pad, bn, bm, kt, rp,
                                               dt)),
        interpret=_interpret(),
    )(*ins)
    return swn, shn, scal


def _tile_vmem_budget(n_pad, bn, bm, kt, rp, dt):
    """Scoped-VMEM budget from the actual buffers.  Mosaic stores
    every VMEM buffer lane-padded to 128 (and f32 sublanes to 8), so
    the narrow (·, kt) and (·, rp) blocks are costed at 128 lanes;
    ~10 (bn, bm) temporaries cover the densify/wth/a/log live set
    (measured: 19.7 MB at bn=1024, bm=128, kt=20, rp=16).  Raises at
    the 100 MB cap so shape limits surface clearly.
    """
    def padl(v):
        return _round_up(v, 128)

    ds = dt.itemsize
    need = (2 * kt * padl(bn) * (4 + ds)       # cols+vals, db
            + 2 * 2 * bn * padl(rp) * ds       # lw in + swn out, db
            + 2 * 2 * _round_up(rp, 8) * padl(bm) * ds  # lh + shn
            + 4 * n_pad * padl(rp)             # swn scratch
            + bn * bm * ds                     # xd scratch
            + (10 + 3 * _SLOT_GROUP) * bn * bm * 4   # VPU temporaries
            + 8 * 2 ** 20)
    cap = 100 * 2 ** 20
    if need > cap:
        raise ValueError(
            f"tile-sparse kernel needs ~{need / 2 ** 20:.0f} MB VMEM "
            f"at (bn={bn}, bm={bm}, kt={kt}, rp={rp}, n_pad={n_pad}) "
            f"— over the {cap // 2 ** 20} MB budget; use smaller "
            "blocks (from_scipy_tile bn/bm) or a lower kt_cap.")
    return max(16 * 2 ** 20, need)


def _pad_lw(lw, n_pad, rp):
    """(n, r) -> (n_pad, rp): gene rows pad 1 (keeps wth positive for
    zero-padded X rows), rank cols pad 0."""
    n, r = lw.shape
    out = jnp.pad(lw, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    return jnp.pad(out, ((0, 0), (0, rp - r)))


def _pad_lh(lh, m_pad, rp):
    """(r, m) -> (rp, m_pad): cell cols pad 1, rank rows pad 0."""
    r, m = lh.shape
    out = jnp.pad(lh, ((0, 0), (0, m_pad - m)), constant_values=1.0)
    return jnp.pad(out, ((0, rp - r), (0, 0)))


@functools.partial(jax.jit, static_argnames=("mxu_bf16",))
def fused_tile(tc: TileCounts, lw, lh, do_elbo=None, mxu_bf16=False):
    """Single-launch fused backend over the tile-sparse layout:
    (swn, shn, dterm) exactly as ops.vb.fused_dense /
    ops.sparse.fused_coo, with sw = lw*swn, sh = lh*shn.

    ``do_elbo`` (dynamic scalar; default on) skips the kernel's
    O(nnz) x*log(wth) transcendental — the elbo_every cadence's
    steady-state sweep; the returned dterm is then meaningless and
    must not be consumed (ops.vb._vb_run_fused guards this).
    ``mxu_bf16`` pre-casts the kernel GEMM operands (precision='bf16').
    """
    n, m = tc.n, tc.m
    r = lw.shape[1]
    rp = _round_up(max(r, 8), 8)
    n_pad = tc.ni * tc.bn
    m_pad = tc.nj * tc.bm
    lw_p = _pad_lw(lw, n_pad, rp)
    lh_p = _pad_lh(lh, m_pad, rp)

    swn_p, shn_p, scal = _tile_pass(tc, lw_p, lh_p,
                                    do_elbo=do_elbo,
                                    mxu_bf16=mxu_bf16)
    swn = swn_p[:n, :r]
    shn = shn_p[:r, :m]
    # Kahan (y=xl-c; t=s+y; c=(t-s)-y) leaves c holding the amount the
    # running sum s OVERSHOT; the refined total is s - c
    xlog = (scal[0, 0] - scal[0, 1]).astype(lw.dtype)

    # overflow tail (COO scatter over a few % of nnz)
    lw_ext = jnp.concatenate([lw, jnp.zeros((1, r), lw.dtype)])
    lh_ext = jnp.concatenate(
        [lh, jnp.zeros((r, 1), lh.dtype)], axis=1).T       # (m+1, r)
    t_swn, t_xlog = _tail_scan(tc.trow, tc.tcol, tc.tval,
                               lw_ext, lh_ext, n, with_xlog=True)
    t_shn, _ = _tail_scan(tc.tcol, tc.trow, tc.tval,
                          lh_ext, lw_ext, m, with_xlog=False)
    swn = swn + t_swn
    shn = shn + t_shn.T
    xlog = xlog + t_xlog

    dterm = (-(jnp.sum(swn * (lw * jnp.log(lw)))
               + jnp.sum(shn * (lh * jnp.log(lh)))) + xlog)
    return swn, shn, dterm


def make_tile_fused(mxu_bf16=False):
    """Fused kernel for vb_run(fused=...)/vb_factorize
    backend='sparse' with sparse_layout='tile' (the 'auto' default).
    Accepts vb_run's optional ``do_elbo`` flag (elbo_every cadence)."""
    def fused(x, lw, lh, do_elbo=None):
        return fused_tile(x, lw, lh, do_elbo=do_elbo,
                          mxu_bf16=mxu_bf16)

    return fused


# ---------------------------------------------------------------------
# ML (Lee-Seung) phases over the tile layout
# ---------------------------------------------------------------------

@jax.jit
def tile_ml_h(tc: TileCounts, w, h):
    """ML H-phase: (hn, xlogwh) with hn = w^T (x/wh) and
    xlogwh = sum x log(wh) — the tile dual of
    ops.pallas.ml_kernels.ml_h_pallas (contract of
    ops.ml.ml_run(fused_h=...))."""
    n, m = tc.n, tc.m
    r = w.shape[1]
    rp = _round_up(max(r, 8), 8)
    w_p = _pad_lw(w, tc.ni * tc.bn, rp)
    h_p = _pad_lh(h, tc.nj * tc.bm, rp)
    _, shn_p, scal = _tile_pass(tc, w_p, h_p,
                                want=(False, True, True))
    hn = shn_p[:r, :m]
    xlog = (scal[0, 0] - scal[0, 1]).astype(w.dtype)  # s - c, see fused_tile

    w_ext = jnp.concatenate([w, jnp.zeros((1, r), w.dtype)])
    h_ext = jnp.concatenate(
        [h, jnp.zeros((r, 1), h.dtype)], axis=1).T
    t_hn, t_xlog = _tail_scan(tc.tcol, tc.trow, tc.tval,
                              h_ext, w_ext, m, with_xlog=True)
    return hn + t_hn.T, xlog + t_xlog


@jax.jit
def tile_ml_w(tc: TileCounts, w, h):
    """ML W-phase: wn = (x/wh) h^T for the UPDATED h — the tile dual
    of ml_w_pallas."""
    n, m = tc.n, tc.m
    r = w.shape[1]
    rp = _round_up(max(r, 8), 8)
    w_p = _pad_lw(w, tc.ni * tc.bn, rp)
    h_p = _pad_lh(h, tc.nj * tc.bm, rp)
    swn_p, _, _ = _tile_pass(tc, w_p, h_p,
                             want=(True, False, False))
    wn = swn_p[:n, :r]

    w_ext = jnp.concatenate([w, jnp.zeros((1, r), w.dtype)])
    h_ext = jnp.concatenate(
        [h, jnp.zeros((r, 1), h.dtype)], axis=1).T
    t_wn, _ = _tail_scan(tc.trow, tc.tcol, tc.tval,
                         w_ext, h_ext, n, with_xlog=False)
    return wn + t_wn


def make_tile_ml_backend():
    """(fused_h, fused_w) pair for ops.ml.ml_run over a TileCounts —
    factorize(backend='sparse')."""
    def fused_h(x, w, h):
        return tile_ml_h(x, w, h)

    def fused_w(x, w, h):
        return tile_ml_w(x, w, h)

    return fused_h, fused_w
