"""Multi-host (multi-process) runtime initialization and result gathering.

The reference's only inter-node mechanism is SLURM job arrays with offline
CSV concatenation (SURVEY.md §2.3; the mpi4py design at lmm/lmm.py:308-330
was never implemented).  Here multi-host runs are one SPMD program:

    # on every host (e.g. one process per TPU host in a v5p pod slice):
    from pygemma_tpu.parallel import distributed
    distributed.initialize()            # jax.distributed over DCN
    mesh = make_mesh(snp=jax.device_count())
    df = pygemma(Y, X_local, W, K, mesh=mesh, ...)

Each host feeds its local SNP shard; per-SNP outputs stay sharded over the
``snp`` axis and are gathered with :func:`gather_table`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax.distributed runtime (no-op for single process).

    Defaults come from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID or the TPU pod metadata); SLURM
    fallbacks mirror the reference's env-driven sharding
    (tests/benchmark_pygemma.py:329-336).
    """
    if num_processes is None:
        num_processes = int(
            os.environ.get("JAX_NUM_PROCESSES",
                           os.environ.get("SLURM_NTASKS", 1))
        )
    if num_processes <= 1:
        return
    if process_id is None:
        process_id = int(
            os.environ.get("JAX_PROCESS_ID",
                           os.environ.get("SLURM_PROCID", 0))
        )
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def gather_table(sharded_cols: dict) -> dict:
    """All-gather per-SNP result columns from a SNP-sharded computation.

    Accepts a dict of jax Arrays sharded over the snp axis; returns host
    NumPy arrays with the full global table on every process (the in-program
    replacement for the reference's offline CSV concatenation,
    tests/combine_benchmarks.py:17-29).
    """
    import jax.experimental.multihost_utils as mhu

    out = {}
    for k, v in sharded_cols.items():
        if hasattr(v, "is_fully_addressable") and not v.is_fully_addressable:
            out[k] = np.asarray(mhu.process_allgather(v, tiled=True))
        else:
            out[k] = np.asarray(v)
    return out
