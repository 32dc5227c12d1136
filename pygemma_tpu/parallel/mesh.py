"""Device-mesh construction and sharding helpers.

The reference's multi-node story is SLURM job arrays with offline result
concatenation (SURVEY.md §2.3); here scale-out is a first-class
``jax.sharding.Mesh`` program: SNP axis data-parallel across chips/hosts,
sample axis for the distributed eigendecomposition/rotation, association
tables all-gathered by XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    snp: Optional[int] = None,
    sample: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    snp_axis: str = "snp",
    sample_axis: str = "sample",
) -> Mesh:
    """Build a (sample, snp) mesh; ``snp=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if snp is None:
        snp = len(devices) // sample
    use = devices[: sample * snp]
    arr = np.array(use).reshape(sample, snp)
    return Mesh(arr, (sample_axis, snp_axis))


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices of other processes (multi-host
    SPMD: host data must enter via ``make_array_from_callback``, since a
    plain ``device_put`` cannot target non-addressable devices)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def put_replicated(x, mesh: Mesh) -> jax.Array:
    """Replicate host (or single-device) data onto the whole mesh.

    Works across processes: every process must hold the SAME values (the
    driver's replicated inputs -- eigenvalues, eigenbasis, covariates --
    are computed deterministically or loaded identically on each host)."""
    sh = replicated(mesh)
    if not mesh_spans_processes(mesh):
        return jax.device_put(x, sh)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def snp_sharding(mesh: Mesh, snp_axis: str = "snp") -> NamedSharding:
    """(n, B) genotype block sharded over its SNP (second) axis."""
    return NamedSharding(mesh, P(None, snp_axis))


def row_sharding(mesh: Mesh, sample_axis: str = "sample") -> NamedSharding:
    """(n, ...) matrix sharded over the sample (first) axis."""
    return NamedSharding(mesh, P(sample_axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def result_sharding(mesh: Mesh, snp_axis: str = "snp") -> NamedSharding:
    """(B,) per-SNP outputs sharded over the SNP axis."""
    return NamedSharding(mesh, P(snp_axis))
