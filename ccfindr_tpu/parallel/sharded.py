"""Sharded fused-kernel backends: explicit SPMD over the cell axis.

The dense mesh path lets GSPMD auto-partition the XLA einsums; this
module instead runs the fused single-pass Pallas kernel PER SHARD via
``shard_map`` and inserts the collectives by hand — the TPU-native
analog of the communication plan in SURVEY.md §2.3/§5:

per sweep, each device reads only its (genes x local-cells) block of X
and contributes

* ``psum`` of the n x r sufficient-stat partial ``swn`` (W is
  replicated; its statistics reduce over cell shards),
* its local slice of ``shn`` (H is cell-sharded; no communication),
* ``psum`` of the scalar ELBO data term.

Communication per sweep is O(n*r) floats — tiny next to the
O(n*m_local*r) on-chip compute.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:                                     # JAX >= 0.8
    from jax import shard_map as _shard_map

    def _smap(fn, mesh, in_specs, out_specs):
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:                      # older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

    def _smap(fn, mesh, in_specs, out_specs):
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


def make_fused_sharded(mesh: Mesh, fused_local=None,
                       bn: int = None, bm: int = None,
                       mxu_bf16: bool = False):
    """Fused backend for ops.vb.vb_run(fused=...) over a cell-sharded
    mesh.

    ``fused_local(x_local, lw, lh_local) -> (swn_part, shn_local,
    dterm_part)`` runs on each device's X block; defaults to the
    single-pass Pallas kernel (ops.pallas.fused_pallas), which
    zero-pads its local block to tile boundaries internally (padding
    contributes nothing).  X must be sharded P(None, 'cells') and the
    global cell count divisible by the 'cells' axis size (the driver's
    cell padding + mask guarantees this).
    """
    if fused_local is None:
        from ..ops.pallas import vb_kernels as pk
        kw = {"mxu_bf16": mxu_bf16}
        if bn is not None:
            kw["bn"] = bn
        if bm is not None:
            kw["bm"] = bm

        def fused_local(x, lw, lh):
            return pk.fused_pallas(x, lw, lh, **kw)

    g = "genes" if "genes" in mesh.axis_names else None

    def local(x, lw, lh):
        swn, shn, dterm = fused_local(x, lw, lh)
        # duals: swn rows are gene-local, reduce over cell shards;
        # shn cols are cell-local, reduce over gene shards
        swn = jax.lax.psum(swn, "cells")
        if g is not None:
            shn = jax.lax.psum(shn, g)
            dterm = jax.lax.psum(dterm, (g, "cells"))
        else:
            dterm = jax.lax.psum(dterm, "cells")
        return swn, shn, dterm

    return _smap(local, mesh,
                 in_specs=(P(g, "cells"), P(g, None),
                           P(None, "cells")),
                 out_specs=(P(g, None), P(None, "cells"), P()))


def make_sparse_fused_sharded(mesh: Mesh, chunk: int = 1 << 16):
    """Fused sparse backend for ops.vb.vb_run(fused=...) over a
    cell-sharded mesh — NO dense X anywhere.

    ``x`` is an ops.sparse.SparseCounts built by
    ``from_scipy_sharded(csr, mesh.shape['cells'])``: row/col/val of
    shape (n_shards, nnz_loc_pad) sharded on axis 0 over 'cells', with
    LOCAL column indices.  Each device scans only its own cells'
    nonzeros; the collectives are identical to the dense sharded path
    (psum of the n x r suffstat partial and the scalar ELBO term —
    the fold of the partial swn against lw*log(lw) commutes with the
    psum by linearity).
    """
    from ..ops import sparse as sk

    def local(x, lw, lh):
        sc = sk.SparseCounts(row=x.row[0], col=x.col[0], val=x.val[0],
                             n=x.n, m=x.m)
        swn, shn, dterm = sk.fused_coo(sc, lw, lh, chunk=chunk)
        swn = jax.lax.psum(swn, "cells")
        dterm = jax.lax.psum(dterm, "cells")
        return swn, shn, dterm

    # P('cells') as a tree-prefix leaf applies to every SparseCounts
    # array leaf (row/col/val, all sharded on axis 0)
    return _smap(local, mesh,
                 in_specs=(P("cells"), P(None, None),
                           P(None, "cells")),
                 out_specs=(P(None, None), P(None, "cells"), P()))


def make_ell_fused_sharded(mesh: Mesh):
    """Fused ELL backend for ops.vb.vb_run(fused=...) over a
    cell-sharded mesh — gather-only sparse, NO dense X anywhere.

    ``x`` is an ops.ell.EllCounts built by
    ``from_scipy_ell_sharded(csr, mesh.shape['cells'])``: every leaf
    carries a leading shard axis over 'cells', cell indices local to
    the shard.  Collectives are identical to the COO sharded path:
    psum of the n x r swn partial and the scalar ELBO term (the
    lw*log(lw) fold commutes with the psum by linearity); shn is
    cell-local.
    """
    from ..ops import ell as ek

    def local(x, lw, lh):
        ec = jax.tree.map(lambda a: a[0], x)
        swn, shn, dterm = ek.fused_ell(ec, lw, lh)
        swn = jax.lax.psum(swn, "cells")
        dterm = jax.lax.psum(dterm, "cells")
        return swn, shn, dterm

    return _smap(local, mesh,
                 in_specs=(P("cells"), P(None, None),
                           P(None, "cells")),
                 out_specs=(P(None, None), P(None, "cells"), P()))


def make_tile_fused_sharded(mesh: Mesh, mxu_bf16: bool = False):
    """Fused tile-sparse backend for ops.vb.vb_run(fused=...) over a
    cell-sharded mesh — the Pallas capacity path, NO dense X anywhere.

    ``x`` is an ops.tile.TileCounts built by
    ``from_scipy_tile_sharded(csr, mesh.shape['cells'])``: every leaf
    carries a leading shard axis over 'cells', cell indices local to
    the shard.  Collectives are identical to the other sparse sharded
    paths: psum of the n x r swn partial and the scalar ELBO term;
    shn is cell-local.  Accepts vb_run's optional ``do_elbo`` flag
    (elbo_every cadence) and ``mxu_bf16`` (precision='bf16').
    """
    from ..ops import tile as tl

    def local(x, lw, lh, do_elbo):
        tc = jax.tree.map(lambda a: a[0], x)
        swn, shn, dterm = tl.fused_tile(tc, lw, lh, do_elbo=do_elbo,
                                        mxu_bf16=mxu_bf16)
        swn = jax.lax.psum(swn, "cells")
        dterm = jax.lax.psum(dterm, "cells")
        return swn, shn, dterm

    sharded = _smap(local, mesh,
                    in_specs=(P("cells"), P(None, None),
                              P(None, "cells"), P()),
                    out_specs=(P(None, None), P(None, "cells"), P()))

    def fused(x, lw, lh, do_elbo=None):
        import jax.numpy as jnp
        if do_elbo is None:
            do_elbo = jnp.ones((), lw.dtype)
        return sharded(x, lw, lh, do_elbo)

    return fused


def make_tile_ml_sharded(mesh: Mesh):
    """(fused_h, fused_w) ML backends over a cell-sharded tile-sparse
    layout — sparse `factorize` on a mesh (reference scale story
    R/factorize.R:139-276, here without densification).

    Same collective pattern as :func:`make_ml_sharded`: the H-phase
    numerator stays cell-local and the likelihood scalar psums; the
    W-phase numerator (n x r) psums over cell shards.
    """
    from ..ops import tile as tl

    def local_h(x, w, h):
        tc = jax.tree.map(lambda a: a[0], x)
        hn, xlw = tl.tile_ml_h(tc, w, h)
        return hn, jax.lax.psum(xlw, "cells")

    def local_w(x, w, h):
        tc = jax.tree.map(lambda a: a[0], x)
        return jax.lax.psum(tl.tile_ml_w(tc, w, h), "cells")

    fused_h = _smap(local_h, mesh,
                    in_specs=(P("cells"), P(None, None),
                              P(None, "cells")),
                    out_specs=(P(None, "cells"), P()))
    fused_w = _smap(local_w, mesh,
                    in_specs=(P("cells"), P(None, None),
                              P(None, "cells")),
                    out_specs=P(None, None))
    return fused_h, fused_w


def make_ml_sharded(mesh: Mesh, bn: int = None, bm: int = None):
    """(fused_h, fused_w) ML backends over a cell-sharded mesh.

    Per sweep each device reads only its (genes x local-cells) block:
    the H-update numerator and H itself stay local (no communication);
    the W-update numerator (n x r) and the scalar likelihood term are
    psum'd — the same O(n*r) per-sweep communication as the VB path.
    Local blocks run the fused Pallas ML kernels (which tile-pad their
    shard internally).
    """
    from ..ops.pallas import ml_kernels as mlk
    kw = {}
    if bn is not None:
        kw["bn"] = bn
    if bm is not None:
        kw["bm"] = bm

    def local_h(x, w, h):
        hn, xlw = mlk.ml_h_pallas(x, w, h, **kw)
        return hn, jax.lax.psum(xlw, "cells")

    def local_w(x, w, h):
        return jax.lax.psum(mlk.ml_w_pallas(x, w, h, **kw), "cells")

    fused_h = _smap(local_h, mesh,
                    in_specs=(P(None, "cells"), P(None, None),
                              P(None, "cells")),
                    out_specs=(P(None, "cells"), P()))
    fused_w = _smap(local_w, mesh,
                    in_specs=(P(None, "cells"), P(None, None),
                              P(None, "cells")),
                    out_specs=P(None, None))
    return fused_h, fused_w
