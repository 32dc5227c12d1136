"""Pallas TPU kernel: fused per-SNP-lambda Gram statistics.

The per-SNP-lambda evaluation (bisection/Newton refinement,
:func:`pygemma_tpu.core.grams.grams_per_snp_lambda`) is HBM-bound under
plain XLA: the (B, n) weight matrices d^k = (lam_b*Lambda_i + 1)^-k are
materialized as matmul operands for k = 1, 2, 3.  This kernel fuses the
weight computation with all contractions so d^k lives only in VMEM tiles,
and evaluates R lambda values per SNP (the solver's root slots) in the same
pass so the genotype block is read once for all slots:

  inputs per (b, i) grid cell                    work (for each slot r < R)
  ---------------------------------------------  --------------------------
  lam   (B_tile, R)        per-SNP lambdas       h = lam_r*ev + 1, d = 1/h
  ev    (1, n_tile)        eigenvalues           d^k built in VMEM
  pairs (n_tile, MP)       shared pair products  S_kr  += d^k @ pairs  (MXU)
        [last real column is all-ones -> sum_d]
  shared(n_tile, SP)       [W | y] columns       vS_kr += (d^k * vT) @ shared
  vT    (B_tile, n_tile)   genotype rows         vv_kr += rowsum(d^k * vT^2)
  logh  (optional)         sum_logh += log(h) @ ones-column

Padding contract (handled by :func:`fused_grams`): n is padded with ev = 0
rows (h = 1 -> log h = 0 keeps sum_logh exact) and zero rows of
pairs/shared/vT (kills their contributions); sum_d/sum_d2 come from the
ones-column of ``pairs`` which is zero on padded rows, so no masking is
needed anywhere in the kernel.
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


def _split_bf16(a):
    """Split an f32 operand into (hi, lo) bfloat16 parts with a ~= hi + lo."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """Split-precision matmul: 3 bf16 MXU passes with f32 accumulation.

    Mosaic lowers a plain f32 ``jnp.dot`` to a SINGLE bf16 MXU pass on this
    hardware (verified empirically: explicit bf16 casts are bit-identical to
    the f32 dot), which costs ~2^-8 relative error -- far too coarse for the
    cancellation-prone REML scalars.  The classic bf16x3 split recovers
    ~2^-16 operand precision for ~3x the MXU work; the kernel is nowhere
    near MXU-bound, so this is almost free.
    """
    acc = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return acc


def _kernel(lam_ref, ev_ref, pairs_ref, shared_ref, vT_ref, out_ref,
            *, R: int, kmax: int, mp: int, sp: int, want_logh: bool,
            stride: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ev = ev_ref[:]  # (1, n_tile)
    vT = vT_ref[:]  # (B_tile, n_tile)
    vT2 = vT * vT
    pairs = pairs_ref[:]  # (n_tile, mp)
    shared = shared_ref[:]  # (n_tile, sp)
    # loop-invariant split-precision halves of the right operands
    pairs_hi, pairs_lo = _split_bf16(pairs)
    shared_hi, shared_lo = _split_bf16(shared)

    for r in range(R):
        lam_r = lam_ref[:, r:r + 1]  # (B_tile, 1)
        h = lam_r * ev + 1.0  # (B_tile, n_tile)
        d = 1.0 / h
        base = r * stride
        dk = d
        for k in range(kmax):
            dk_hi, dk_lo = _split_bf16(dk)
            out_ref[:, base + k * mp:base + (k + 1) * mp] += _dot3(
                dk_hi, dk_lo, pairs_hi, pairs_lo
            )
            z_hi, z_lo = _split_bf16(dk * vT)
            off = base + kmax * mp + k * sp
            out_ref[:, off:off + sp] += _dot3(
                z_hi, z_lo, shared_hi, shared_lo
            )
            vv = jnp.sum(dk * vT2, axis=1, keepdims=True)
            off = base + kmax * (mp + sp) + k
            out_ref[:, off:off + 1] += vv
            if k + 1 < kmax:
                dk = dk * d
        if want_logh:
            ones_col = pairs[:, mp - 1:mp]  # zero on padded rows
            # ones/zeros are exact in bf16, so splitting only log(h) keeps
            # the logdet(H) accumulation at ~f32 accuracy (2 MXU passes).
            lh_hi, lh_lo = _split_bf16(jnp.log(h))
            ones_hi = ones_col.astype(jnp.bfloat16)
            slh = jnp.dot(lh_hi, ones_hi,
                          preferred_element_type=jnp.float32)
            slh += jnp.dot(lh_lo, ones_hi,
                           preferred_element_type=jnp.float32)
            off = base + kmax * (mp + sp) + kmax
            out_ref[:, off:off + 1] += slh


@functools.partial(
    jax.jit, static_argnames=("R", "kmax", "want_logh", "m", "s")
)
def _fused_grams_padded(lam_p, ev_p, pairs_p, shared_p, vT_p,
                        R: int, kmax: int, want_logh: bool, m: int, s: int):
    Bp, n_p = vT_p.shape
    mp = pairs_p.shape[1]
    sp = shared_p.shape[1]
    stride = kmax * (mp + sp) + kmax + 1
    out_cols = _round_up(R * stride, 128)
    grid = (Bp // B_TILE, n_p // N_TILE)

    kernel = functools.partial(
        _kernel, R=R, kmax=kmax, mp=mp, sp=sp, want_logh=want_logh,
        stride=stride,
    )
    flops = R * (2 * Bp * n_p * kmax * (mp + sp) + 10 * Bp * n_p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_TILE, lam_p.shape[1]), lambda b, i: (b, 0),
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
            transcendentals=R * Bp * n_p if want_logh else 0,
        ),
    )(lam_p, ev_p, pairs_p, shared_p, vT_p)
    return out


def fused_grams(
    lam: jnp.ndarray,  # (B,) or (B, R)
    ev: jnp.ndarray,  # (n,)
    pairs: jnp.ndarray,  # (n, m) WITHOUT the ones column
    shared: jnp.ndarray,  # (n, s)
    vT: jnp.ndarray,  # (B, n) per-SNP rows (transposed genotype block)
    kmax: int,
    want_logh: bool = False,
):
    """Returns (S (B[,R],kmax,m), vS (B[,R],kmax,s), vv (B[,R],kmax),
    sum_d, sum_d2, sum_logh) with the same numerical contract as the XLA
    path.  A 2-D ``lam`` evaluates R lambda slots per SNP in one pass."""
    squeeze = lam.ndim == 1
    if squeeze:
        lam = lam[:, None]
    B, R = lam.shape
    n = vT.shape[1]
    m = pairs.shape[1]
    s = shared.shape[1]
    n_p = _round_up(n, N_TILE)
    Bp = _round_up(B, B_TILE)
    mp = _round_up(m + 1, 128)
    sp = _round_up(s, 128)

    f32 = jnp.float32
    lam_p = jnp.zeros((Bp, R), f32).at[:B].set(lam.astype(f32))
    ev_p = jnp.zeros((1, n_p), f32).at[0, :n].set(ev.astype(f32))
    pairs_p = jnp.zeros((n_p, mp), f32)
    pairs_p = pairs_p.at[:n, :m].set(pairs.astype(f32))
    pairs_p = pairs_p.at[:n, mp - 1].set(1.0)  # ones column (sum_d / logh)
    shared_p = jnp.zeros((n_p, sp), f32).at[:n, :s].set(shared.astype(f32))
    vT_p = jnp.zeros((Bp, n_p), f32).at[:B, :n].set(vT.astype(f32))

    out = _fused_grams_padded(lam_p, ev_p, pairs_p, shared_p, vT_p,
                              R, kmax, want_logh, m, s)
    out = out[:B]
    stride = kmax * (mp + sp) + kmax + 1

    def slot(r):
        base = r * stride
        S = jnp.stack(
            [out[:, base + k * mp:base + k * mp + m] for k in range(kmax)],
            axis=1,
        )
        sum_d = out[:, base + mp - 1]
        sum_d2 = (out[:, base + mp + mp - 1] if kmax >= 2
                  else jnp.zeros_like(sum_d))
        vS = jnp.stack(
            [out[:, base + kmax * mp + k * sp:base + kmax * mp + k * sp + s]
             for k in range(kmax)],
            axis=1,
        )
        vb = base + kmax * (mp + sp)
        vv = out[:, vb:vb + kmax]
        sum_logh = (out[:, vb + kmax] if want_logh
                    else jnp.zeros_like(sum_d))
        return S, vS, vv, sum_d, sum_d2, sum_logh

    parts = [slot(r) for r in range(R)]
    if squeeze:
        return parts[0]
    # stack slot axis right after B: (B, R, ...)
    return tuple(
        jnp.stack([p[i] for p in parts], axis=1) for i in range(6)
    )
