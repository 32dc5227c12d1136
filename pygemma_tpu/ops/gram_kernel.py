"""Pallas TPU kernel: fused per-SNP-lambda Gram statistics (transposed layout).

The per-SNP-lambda evaluation (bisection/Newton refinement,
:func:`pygemma_tpu.core.grams.grams_per_snp_lambda`) is hostile to plain XLA:
the (n, B) weight matrices d^k = (lam_b*Lambda_i + 1)^-k are materialized in
HBM as matmul operands for k = 1, 2, 3.  This kernel fuses the weight
computation with all contractions so d^k lives only in VMEM tiles, and
evaluates R lambda values per SNP (the solver's root slots) in the same pass
so the genotype block is read once for all slots.

Layout: the SNP axis rides the 128-wide *lane* dimension of every operand
and output, and the tiny Gram dimensions (m pair columns, s shared columns)
ride the *sublane* (row) dimension:

  inputs per (b, i) grid cell                    work (for each slot r < R)
  ---------------------------------------------  --------------------------
  lam    (R, B_tile)       per-SNP lambdas       h = ev*lam_r + 1, d = 1/h
  ev     (n_tile, 128)     eigenvalues (col 0)     -> (n_tile, B_tile)
  pairsT (MP, n_tile)      shared pair products   S_kr  += pairsT @ d^k (MXU)
         [last real row is all-ones -> sum_{d^k}]
  sharedT(SP, n_tile)      [W | y] columns        vS_kr += sharedT @ (d^k*v)
  v      (n_tile, B_tile)  genotype columns       vv_kr += colsum(d^k * v^2)
  logh   (optional)        sum_logh += colsum(log h)   [VPU, exact]

The MXU cost of a (M, K) @ (K, N) matmul scales with M x K x N where M is
the streamed sublane dimension: putting the ~15 real Gram rows on M (padded
to 16) instead of padding them to a 128-lane N axis cuts the MXU work ~8x
versus the row-major formulation, and the genotype block is consumed in its
natural (n, B) orientation (no transpose copy).

All dots run in split bf16x3 precision (see :func:`_dot3`): Mosaic lowers a
plain f32 dot to a SINGLE bf16 MXU pass on this hardware, which is far too
coarse for the cancellation-prone REML scalars downstream.

Padding contract (handled by :func:`fused_grams`): n is padded with ev = 0
rows (h = 1 -> log h = 0 keeps the VPU sum_logh exact) and zero rows of
pairsT/sharedT/v (kills their contributions); sum_d / sum_d2 come from the
all-ones row of ``pairsT`` which is zero on padded columns, so no masking is
needed anywhere in the kernel.

Replaces the reference's per-SNP sequential BLAS recursion
(``precompute_mat``, reference pygemma_model/pygemma_model.pyx:880-1053).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_TILE = 256  # SNP lanes per grid cell (multiple of 128)
N_TILE = 1024  # contraction (samples) tile
ROW_PAD = 16  # sublane granularity for the tiny Gram dimensions
TAIL = 8  # rows reserved for [vv_1..vv_kmax, sum_logh, 0...]


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
    ~2^-16 operand precision for 3x the (small) MXU work.
    """
    acc = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return acc


def _kernel(lam_ref, ev_ref, pairsT_ref, sharedT_ref, v_ref, out_ref,
            *, R: int, kmax: int, mp: int, sp: int, want_logh: bool,
            stride: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ev = ev_ref[:, :1]  # (n_tile, 1); zero on padded rows
    v = v_ref[:]  # (n_tile, B_tile)
    v2 = v * v
    pT = pairsT_ref[:]  # (mp, n_tile); row mp-1 is all-ones (zero on pad)
    sT = sharedT_ref[:]  # (sp, n_tile)
    # loop-invariant split-precision halves of the stationary operands
    pT_hi, pT_lo = _split_bf16(pT)
    sT_hi, sT_lo = _split_bf16(sT)

    for r in range(R):
        lam_r = lam_ref[r:r + 1, :]  # (1, B_tile)
        h = ev * lam_r + 1.0  # (n_tile, B_tile); 1.0 on padded rows
        d = 1.0 / h
        base = r * stride
        dk = d
        tail = []
        for k in range(kmax):
            dk_hi, dk_lo = _split_bf16(dk)
            out_ref[base + k * mp:base + (k + 1) * mp, :] += _dot3(
                pT_hi, pT_lo, dk_hi, dk_lo
            )
            z = dk * v
            z_hi, z_lo = _split_bf16(z)
            off = base + kmax * mp + k * sp
            out_ref[off:off + sp, :] += _dot3(sT_hi, sT_lo, z_hi, z_lo)
            # colsum over samples: padded rows of v are zero, so exact
            tail.append(jnp.sum(dk * v2, axis=0, keepdims=True))
            if k + 1 < kmax:
                dk = dk * d
        if want_logh:
            # log h = 0 on padded rows -> plain f32 VPU reduction is exact
            tail.append(jnp.sum(jnp.log(h), axis=0, keepdims=True))
        nt = len(tail)
        tail.append(jnp.zeros((TAIL - nt, v.shape[1]), jnp.float32))
        off = base + kmax * (mp + sp)
        out_ref[off:off + TAIL, :] += jnp.concatenate(tail, axis=0)


@functools.partial(
    jax.jit, static_argnames=("R", "kmax", "want_logh", "m", "s")
)
def _fused_grams_padded(lam_t, ev_p, pairsT_p, sharedT_p, v_p,
                        R: int, kmax: int, want_logh: bool, m: int, s: int):
    n_p, Bp = v_p.shape
    mp = pairsT_p.shape[0]
    sp = sharedT_p.shape[0]
    stride = kmax * (mp + sp) + TAIL
    out_rows = R * stride
    grid = (Bp // B_TILE, n_p // N_TILE)

    kernel = functools.partial(
        _kernel, R=R, kmax=kmax, mp=mp, sp=sp, want_logh=want_logh,
        stride=stride,
    )
    flops = R * kmax * (2 * Bp * n_p * (mp + sp) * 3 + 8 * Bp * n_p)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, B_TILE), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_TILE, 128), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, N_TILE), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp, N_TILE), lambda b, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_TILE, B_TILE), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, B_TILE), lambda b, i: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_rows, Bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (Bp * n_p + n_p * (mp + sp + 128)
                                + Bp * out_rows),
            transcendentals=R * Bp * n_p if want_logh else 0,
        ),
    )(lam_t, ev_p, pairsT_p, sharedT_p, v_p)
    return out


def fused_grams(
    lam: jnp.ndarray,  # (B,) or (B, R)
    ev: jnp.ndarray,  # (n,)
    pairs: jnp.ndarray,  # (n, m) WITHOUT the ones column
    shared: jnp.ndarray,  # (n, s)
    v: jnp.ndarray,  # (n, B) per-SNP genotype columns
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
    n = v.shape[0]
    m = pairs.shape[1]
    s = shared.shape[1]
    n_p = _round_up(n, N_TILE)
    Bp = _round_up(B, B_TILE)
    mp = _round_up(m + 1, ROW_PAD)
    sp = _round_up(s, ROW_PAD)

    f32 = jnp.float32
    lam_t = jnp.zeros((R, Bp), f32).at[:, :B].set(lam.astype(f32).T)
    ev_p = jnp.zeros((n_p, 128), f32).at[:n, 0].set(ev.astype(f32))
    pairsT_p = jnp.zeros((mp, n_p), f32)
    pairsT_p = pairsT_p.at[:m, :n].set(pairs.astype(f32).T)
    pairsT_p = pairsT_p.at[mp - 1, :n].set(1.0)  # ones row (sum_d / sum_d2)
    sharedT_p = jnp.zeros((sp, n_p), f32).at[:s, :n].set(
        shared.astype(f32).T
    )
    v_p = jnp.zeros((n_p, Bp), f32).at[:n, :B].set(v.astype(f32))

    out = _fused_grams_padded(lam_t, ev_p, pairsT_p, sharedT_p, v_p,
                              R, kmax, want_logh, m, s)
    out = out[:, :B]  # (R * stride, B)
    stride = kmax * (mp + sp) + TAIL

    def slot(r):
        base = r * stride
        S = jnp.stack(
            [out[base + k * mp:base + k * mp + m, :].T for k in range(kmax)],
            axis=1,
        )  # (B, kmax, m)
        sum_d = out[base + mp - 1, :]
        sum_d2 = (out[base + 2 * mp - 1, :] if kmax >= 2
                  else jnp.zeros_like(sum_d))
        vb = base + kmax * mp
        vS = jnp.stack(
            [out[vb + k * sp:vb + k * sp + s, :].T for k in range(kmax)],
            axis=1,
        )  # (B, kmax, s)
        tb = base + kmax * (mp + sp)
        vv = out[tb:tb + kmax, :].T  # (B, kmax)
        sum_logh = (out[tb + kmax, :] if want_logh
                    else jnp.zeros_like(sum_d))
        return S, vS, vv, sum_d, sum_d2, sum_logh

    parts = [slot(r) for r in range(R)]
    if squeeze:
        return parts[0]
    # stack slot axis right after B: (B, R, ...)
    return tuple(
        jnp.stack([p[i] for p in parts], axis=1) for i in range(6)
    )
