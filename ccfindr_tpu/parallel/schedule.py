"""Multi-host work scheduling for rank sweeps and restarts.

TPU-native replacement for the reference's Rmpi load-balanced restart
farm (Rmpi::mpi.applyLB, R/bayesian.R:262-263): the (rank, run) grid is
statically partitioned across JAX processes (hosts); each host runs its
share as one batched vmapped factorization on its local devices, and
per-item scalar results (log evidences) are exchanged with a global
all-gather so every host performs the identical best-of-runs selection.

Static balanced partitioning replaces dynamic load balancing: all items
of one rank cost the same sweeps/sec, and the batched while_loop
already load-balances within a host (instances that converge early
ride along masked).
"""

from __future__ import annotations

import numpy as np


def partition_items(n_items: int, n_procs: int, proc_id: int
                    ) -> np.ndarray:
    """Indices of the work items owned by ``proc_id``.

    Round-robin so that (rank, run) items of the same rank spread
    across hosts (ranks differ in cost; round-robin balances them).
    """
    return np.arange(proc_id, n_items, n_procs)


def rank_run_grid(ranks, nrun: int) -> list[tuple[int, int]]:
    """The flattened (rank, run) work grid, rank-major."""
    return [(r, i) for r in ranks for i in range(nrun)]


def gather_results(local_values: np.ndarray, local_idx: np.ndarray,
                   n_items: int):
    """All-gather scalar per-item results across processes.

    Single-process: scatter local values into the global slots.
    Multi-process: uses jax.experimental.multihost_utils.
    """
    import jax

    out = np.full(n_items, -np.inf)
    out[local_idx] = local_values
    if jax.process_count() == 1:
        return out
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(out)  # (procs, n_items)
    return np.max(np.asarray(gathered), axis=0)
