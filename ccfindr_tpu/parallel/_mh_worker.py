"""Multi-process distributed worker for the real multi-host smoke test.

Spawned as ``python -m ccfindr_tpu.parallel._mh_worker --pid I ...`` by
tests/test_multihost.py and __graft_entry__.dryrun_multichip: each
process joins a real ``jax.distributed`` runtime (localhost Gloo
coordinator, CPU backend), runs the SAME ``vb_factorize`` call — the
(rank, run) grid round-robin partitions across the processes, per-item
log evidences all-gather, and the winning factors replicate
(parallel/schedule.py) — and writes its resulting factors to an ``.npz``
for the parent to compare.  This is the TPU-native analog of the
reference's Rmpi restart farm (R/bayesian.R:260-263) actually executing
across process boundaries, not a monkeypatched allgather.
"""

from __future__ import annotations

import argparse
import os


def build_problem(cf, nrow=24, ncol=36, rank=3, seed=77):
    """The shared toy factorization problem (deterministic in seed)."""
    sim = cf.simulate_whx(nrow=nrow, ncol=ncol, rank=rank, seed=seed)
    return cf.SCSet(count=sim["x"])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, default=2)
    p.add_argument("--port", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--x64", action="store_true")
    p.add_argument("--itmax", type=int, default=300)
    p.add_argument("--ranks", default="2,3,4")
    p.add_argument("--nrun", type=int, default=3)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--mode", default="vb", choices=("vb", "ml"))
    a = p.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.x64:
        jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{a.port}",
        num_processes=a.nproc, process_id=a.pid)
    assert jax.process_count() == a.nproc

    import numpy as np

    import ccfindr_tpu as cf

    s = build_problem(cf)
    ranks = [int(r) for r in a.ranks.split(",")]
    if a.mode == "ml":
        out = cf.factorize(s, ranks=ranks, nrun=a.nrun, verbose=0,
                           Itmax=a.itmax, seed=a.seed)
        arrays = {"lml": out.measure["likelihood"].to_numpy(),
                  "dispersion": out.measure["dispersion"].to_numpy(),
                  "cophenetic": out.measure["cophenetic"].to_numpy()}
    else:
        out = cf.vb_factorize(s, ranks=ranks, nrun=a.nrun, verbose=0,
                              Itmax=a.itmax, seed=a.seed)
        arrays = {"lml": out.measure["lml"].to_numpy()}
    for k, r in enumerate(out.ranks):
        arrays[f"basis_{r}"] = np.asarray(out.basis[k])
        arrays[f"coeff_{r}"] = np.asarray(out.coeff[k])
    np.savez(a.out, ranks=np.asarray(out.ranks), **arrays)
    print(f"mh_worker {a.pid}/{a.nproc} done", flush=True)


if __name__ == "__main__":
    main()
