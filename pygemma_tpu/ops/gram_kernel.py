"""Pallas TPU kernel: fused per-SNP-lambda Gram statistics.

The per-SNP-lambda evaluation (bisection/Newton refinement,
:func:`pygemma_tpu.core.grams.grams_per_snp_lambda`) is HBM-bound under
plain XLA: the (B, n) weight matrices d^k = (lam_b*Lambda_i + 1)^-k are
materialized as matmul operands for k = 1, 2, 3.  This kernel fuses the
weight computation with all contractions so d^k lives only in VMEM tiles:

  inputs per (b, i) grid cell                    work
  ---------------------------------------------  --------------------------
  lam   (B_tile, 1)        per-SNP lambdas       h = lam*ev + 1, d = 1/h
  ev    (1, n_tile)        eigenvalues           d2, d3 in registers/VMEM
  pairs (n_tile, MP)       shared pair products  S_k   += d^k @ pairs  (MXU)
        [last real column is all-ones -> sum_d]
  shared(n_tile, SP)       [W | y] columns       vS_k  += (d^k * vT) @ shared
  vT    (B_tile, n_tile)   genotype rows         vv_k  += rowsum(d^k * vT^2)
  logh  (optional)         sum_logh += log(h) @ ones-column

Padding contract (handled by :func:`fused_grams`): n is padded with ev = 0
rows (h = 1 -> log h = 0 keeps sum_logh exact) and zero rows of
pairs/shared/vT (kills their contributions); sum_d/sum_d2 come from the
ones-column of ``pairs`` which is zero on padded rows, so no masking is
needed anywhere in the kernel.

One HBM pass over vT replaces XLA's ~4 passes (write+read of three d^k
tensors plus the z product); the matmuls ride the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 256
N_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(lam_ref, ev_ref, pairs_ref, shared_ref, vT_ref, out_ref,
            *, kmax: int, mp: int, sp: int, want_logh: bool):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    lam = lam_ref[:]  # (B_tile, 1)
    ev = ev_ref[:]  # (1, n_tile)
    h = lam * ev + 1.0  # (B_tile, n_tile)
    d = 1.0 / h
    vT = vT_ref[:]  # (B_tile, n_tile)
    pairs = pairs_ref[:]  # (n_tile, mp)
    shared = shared_ref[:]  # (n_tile, sp)

    # Stack the k powers along the sublane axis so each contraction is ONE
    # tall matmul (better MXU utilization than kmax skinny ones).
    dks = [d]
    for _ in range(kmax - 1):
        dks.append(dks[-1] * d)
    D = jnp.concatenate(dks, axis=0)  # (kmax*B_tile, n_tile)
    S_all = jnp.dot(D, pairs, preferred_element_type=jnp.float32)
    Z = D * jnp.concatenate([vT] * kmax, axis=0)
    vS_all = jnp.dot(Z, shared, preferred_element_type=jnp.float32)
    vv_all = jnp.sum(Z * jnp.concatenate([vT] * kmax, axis=0), axis=1,
                     keepdims=True)  # (kmax*B_tile, 1)
    bt = lam.shape[0]
    for k in range(kmax):
        out_ref[:, k * mp:(k + 1) * mp] += S_all[k * bt:(k + 1) * bt]
        out_ref[:, kmax * mp + k * sp:kmax * mp + (k + 1) * sp] += (
            vS_all[k * bt:(k + 1) * bt]
        )
        out_ref[:, kmax * (mp + sp) + k:kmax * (mp + sp) + k + 1] += (
            vv_all[k * bt:(k + 1) * bt]
        )

    if want_logh:
        ones_col = pairs[:, mp - 1:mp]  # (n_tile, 1), zero on padded rows
        slh = jnp.dot(jnp.log(h), ones_col,
                      preferred_element_type=jnp.float32)
        out_ref[:, kmax * (mp + sp) + kmax:kmax * (mp + sp) + kmax + 1] += slh


@functools.partial(
    jax.jit, static_argnames=("kmax", "want_logh", "m", "s")
)
def _fused_grams_padded(lam_p, ev_p, pairs_p, shared_p, vT_p,
                        kmax: int, want_logh: bool, m: int, s: int):
    Bp, n_p = vT_p.shape
    mp = pairs_p.shape[1]
    sp = shared_p.shape[1]
    out_cols = _round_up(kmax * (mp + sp) + kmax + 1, 128)
    grid = (Bp // B_TILE, n_p // N_TILE)

    kernel = functools.partial(
        _kernel, kmax=kmax, mp=mp, sp=sp, want_logh=want_logh
    )
    flops = 2 * Bp * n_p * kmax * (mp + sp) + 10 * Bp * n_p
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, 1), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_TILE), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_TILE, mp), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_TILE, sp), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B_TILE, N_TILE), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B_TILE, out_cols), lambda b, i: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (Bp * n_p + n_p * (mp + sp) + Bp * out_cols),
            transcendentals=Bp * n_p if want_logh else 0,
        ),
    )(lam_p, ev_p, pairs_p, shared_p, vT_p)
    return out


def fused_grams(
    lam: jnp.ndarray,  # (B,)
    ev: jnp.ndarray,  # (n,)
    pairs: jnp.ndarray,  # (n, m) WITHOUT the ones column
    shared: jnp.ndarray,  # (n, s)
    vT: jnp.ndarray,  # (B, n) per-SNP rows (transposed genotype block)
    kmax: int,
    want_logh: bool = False,
):
    """Returns (S (B,kmax,m), vS (B,kmax,s), vv (B,kmax), sum_d, sum_d2,
    sum_logh) with the same numerical contract as the XLA path."""
    B, n = vT.shape
    m = pairs.shape[1]
    s = shared.shape[1]
    n_p = _round_up(n, N_TILE)
    Bp = _round_up(B, B_TILE)
    mp = _round_up(m + 1, 128)
    sp = _round_up(s, 128)

    f32 = jnp.float32
    lam_p = jnp.zeros((Bp, 1), f32).at[:B, 0].set(lam.astype(f32))
    ev_p = jnp.zeros((1, n_p), f32).at[0, :n].set(ev.astype(f32))
    pairs_p = jnp.zeros((n_p, mp), f32)
    pairs_p = pairs_p.at[:n, :m].set(pairs.astype(f32))
    pairs_p = pairs_p.at[:n, mp - 1].set(1.0)  # ones column (sum_d / logh)
    shared_p = jnp.zeros((n_p, sp), f32).at[:n, :s].set(shared.astype(f32))
    vT_p = jnp.zeros((Bp, n_p), f32).at[:B, :n].set(vT.astype(f32))

    out = _fused_grams_padded(lam_p, ev_p, pairs_p, shared_p, vT_p,
                              kmax, want_logh, m, s)
    out = out[:B]
    S = jnp.stack([out[:, k * mp:k * mp + m] for k in range(kmax)], axis=1)
    sums_dk = jnp.stack([out[:, k * mp + mp - 1] for k in range(kmax)], axis=1)
    vS = jnp.stack(
        [out[:, kmax * mp + k * sp: kmax * mp + k * sp + s]
         for k in range(kmax)],
        axis=1,
    )
    base = kmax * (mp + sp)
    vv = out[:, base:base + kmax]
    sum_d = sums_dk[:, 0]
    sum_d2 = sums_dk[:, 1] if kmax >= 2 else jnp.zeros_like(sum_d)
    sum_logh = (
        out[:, base + kmax]
        if want_logh
        else jnp.zeros_like(sum_d)
    )
    return S, vS, vv, sum_d, sum_d2, sum_logh
