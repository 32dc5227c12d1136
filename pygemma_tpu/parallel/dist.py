"""Sharded execution of the GWAS pipeline over a device mesh.

Replaces the reference's two scale-out seams with in-program SPMD:

* SNP-axis data parallelism: the reference fans SNP column blocks to a
  ``multiprocessing.Pool`` (lmm/lmm.py:363-401) and concatenates SLURM-array
  outputs offline (tests/combine_benchmarks.py:17-29).  Here the genotype
  block is sharded over the ``snp`` mesh axis; every per-SNP quantity in
  :func:`pygemma_tpu.core.assoc.assoc_block` is elementwise over that axis
  (the only cross-SNP contraction is over samples, which stays local), so
  GSPMD runs it collective-free and the association table is gathered once
  at the end.

* Distributed eigendecomposition + rotation: the reference outsources large
  eigendecompositions to SLATE and re-ingests files
  (experiments/large_gwas/run_pygemma.sh:17-28).  Here ``jnp.linalg.eigh``
  runs under the same jit with K sharded over the sample axis; XLA's
  QDWH-style eigh is matmul-dominated and partitions over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GwasConfig
from ..core.assoc import ImplicitCtx, NullFit, assoc_block
from ..core.eigen import eigendecompose

from .mesh import replicated, snp_sharding


def sharded_assoc_fn(mesh: Mesh, cfg: GwasConfig, de: bool = False,
                     with_null: bool = False, keys=None):
    """jit-compiled association step, SNP-parallel via ``shard_map``.

    Inputs: ev (n,), W (n, c), y (n,) replicated; X (n, B) sharded over the
    ``snp`` axis.  The body is a *per-device* program: each device runs the
    full :func:`assoc_block` on its local (n, B / n_snp) genotype shard --
    including the fused Pallas Gram kernel, which needs no GSPMD
    partitioning rule inside shard_map.  Every per-SNP output is elementwise
    over the snp axis (the solver's cross-SNP root compaction only changes
    *where* a root is refined, never its value), so the body runs
    collective-free and outputs stay sharded over ``snp``.

    With ``keys`` (a static tuple of AssocResult field names) the step
    returns ONE stacked (n_keys, B) buffer, so the driver can defer a single
    device->host pull per block exactly like the single-device path.
    """

    def step(ev, W, y, X, null_arr=None):
        null = (
            NullFit(null_arr[0], null_arr[1], null_arr[2])
            if null_arr is not None
            else None
        )
        res = assoc_block(ev, W, y, X, cfg, null=null, de=de)
        d = res._asdict()
        if keys is not None:
            return jnp.stack([d[k] for k in keys])
        return {k: v for k, v in d.items() if v is not None}

    rep = P()
    in_specs = (rep, rep, rep, P(None, cfg.snp_axis)) + \
        ((rep,) if with_null else ())
    out_specs = P(None, cfg.snp_axis) if keys is not None else P(cfg.snp_axis)
    # check_vma=False: the solver's masked fixed-point loops mix varying
    # (per-shard genotype) and replicated (bracket-grid) carries, which the
    # varying-manual-axes checker cannot type; the body is collective-free
    # by construction, so the check adds nothing here.
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))


def sharded_implicit_prep_fn(mesh: Mesh, cfg: GwasConfig):
    """Top-space rotation + raw residual terms, SNP-parallel.

    U_top (n, p_k) and shared_raw (n, s) are replicated; the genotype block
    and every output are sharded over the snp axis.  Both contractions run
    over the (local) sample axis, so the step is collective-free -- the
    multi-chip analogue of :func:`pygemma_tpu.api._implicit_prep`.
    """
    rep = replicated(mesh)
    xsh = snp_sharding(mesh, cfg.snp_axis)  # (n, B) / (p_k, B)
    rsh = NamedSharding(mesh, P(cfg.snp_axis, None))  # (B, s)
    vsh = NamedSharding(mesh, P(cfg.snp_axis))  # (B,)

    def prep(U_top, shared_raw, xb):
        hi = jax.lax.Precision.HIGH
        C_x = jnp.dot(U_top.T, xb, precision=hi)
        vS_raw = jnp.dot(xb.T, shared_raw, precision=hi)
        vv_raw = jnp.sum(xb * xb, axis=0)
        return C_x, vS_raw, vv_raw

    return jax.jit(prep, in_shardings=(rep, rep, xsh),
                   out_shardings=(xsh, rsh, vsh))


def sharded_assoc_implicit_fn(mesh: Mesh, cfg: GwasConfig, n_total: int,
                              de: bool = False, with_null: bool = False,
                              keys=None):
    """Implicit-complement association step under ``shard_map``.

    Per-device body = :func:`assoc_block` with an :class:`ImplicitCtx` built
    from the local shard's residual terms -- per-SNP work only, so it stays
    collective-free like :func:`sharded_assoc_fn`.
    """

    def step(ev_top, W_c, y_c, C_x, eps, S_raw, vS_raw, vv_raw,
             null_arr=None):
        null = (
            NullFit(null_arr[0], null_arr[1], null_arr[2])
            if null_arr is not None
            else None
        )
        ictx = ImplicitCtx(eps, n_total, S_raw, vS_raw, vv_raw)
        res = assoc_block(ev_top, W_c, y_c, C_x, cfg, null=null, de=de,
                          implicit=ictx)
        d = res._asdict()
        if keys is not None:
            return jnp.stack([d[k] for k in keys])
        return {k: v for k, v in d.items() if v is not None}

    rep = P()
    in_specs = (rep, rep, rep, P(None, cfg.snp_axis), rep, rep,
                P(cfg.snp_axis, None), P(cfg.snp_axis)) + \
        ((rep,) if with_null else ())
    out_specs = P(None, cfg.snp_axis) if keys is not None else P(cfg.snp_axis)
    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))


def sharded_rotate_fn(mesh: Mesh, cfg: GwasConfig):
    """U' X with U replicated and X/output sharded over the snp axis."""
    rep = replicated(mesh)
    xsh = snp_sharding(mesh, cfg.snp_axis)

    def rot(U, X):
        return jnp.dot(U.T, X, precision=jax.lax.Precision.HIGH)

    return jax.jit(rot, in_shardings=(rep, xsh), out_shardings=xsh)


def sharded_eigh_fn(mesh: Mesh, cfg: GwasConfig):
    """eigh with K sharded over the sample axis; (ev, U) come out replicated
    so the rotation can run SNP-parallel against a local U."""
    ksh = NamedSharding(mesh, P(cfg.sample_axis, None))
    rep = replicated(mesh)
    return jax.jit(
        eigendecompose, in_shardings=(ksh,), out_shardings=(rep, rep)
    )
