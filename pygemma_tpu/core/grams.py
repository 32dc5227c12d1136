"""Batched Gram-matrix construction for the GEMMA rotated-space REML problem.

This replaces the reference's per-SNP sequential rank-1-downdate engine
(``precompute_mat``, reference pygemma_model/pygemma_model.pyx:880-1053) with a
TPU-first formulation.  In the eigenbasis of the kinship matrix, every
quantity the REML/ML lambda optimization and the Wald/LRT/score statistics
need is a function of the small Gram matrices

    A_k = T' diag(1 / (lam * Lambda + 1)^k) T,      k = 1, 2, 3

where ``T = [shared columns | per-SNP column]`` stacks the rotated covariates,
phenotype and one genotype column.  Building ``A_k`` for a whole block of B
SNPs at once is a handful of large matmuls (MXU work), after which all
likelihood evaluations are O(B * t^3) batched small-matrix algebra
(:mod:`pygemma_tpu.core.reml`).

Two paths are provided:

* :func:`grams_shared_lambda` -- one lambda for every SNP in the block (the
  decade-grid sweep; reference grid path pygemma_model.pyx:99-132).  Pure
  GEMM, no (B, n) temporaries.
* :func:`grams_per_snp_lambda` -- each SNP carries its own lambda (bisection /
  Newton refinement).  Builds (B, n) weight matrices; this is the kernel the
  Pallas fusion in :mod:`pygemma_tpu.ops.gram_kernel` targets.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# TPU XLA lowers f32 dots to a single bf16 MXU pass by default (~2^-8
# relative operand rounding) -- far too coarse for the cancellation-prone
# REML scalars built from these Grams.  Precision.HIGH (bf16x3 split)
# restores ~2^-16 operand accuracy -- the same contract as the fused Pallas
# kernel -- at half the cost of HIGHEST.
PRECISE = jax.lax.Precision.HIGH


def pdot(a, b):
    """f32-accurate matmul (Precision.HIGH; 3-pass bf16 split on TPU)."""
    return jnp.dot(a, b, precision=PRECISE)


class GramSums(NamedTuple):
    """Per-SNP (or scalar, when lambda is shared) eigenvalue-weight sums.

    ``sum_d``   = sum_i 1/(lam*Lambda_i + 1)        -> tr(H^-1)
    ``sum_d2``  = sum_i 1/(lam*Lambda_i + 1)^2      -> tr(H^-2)
    ``sum_logh``= sum_i log(lam*Lambda_i + 1)       -> logdet(H)
    """

    sum_d: jnp.ndarray
    sum_d2: jnp.ndarray
    sum_logh: jnp.ndarray


class GramComplement(NamedTuple):
    """Implicit-complement extension of a Gram problem (low-rank kinship).

    For K = s*GG' + eps*I the (n - p_k)-dimensional complement eigenspace
    has the SINGLE eigenvalue eps, so the scan never needs the n x n
    eigenbasis (the reference's SLATE seam, experiments/large_gwas/
    run_pygemma.sh:17-34, lmm/lmm.py:196-211): rotate columns only into the
    p_k-dimensional TOP space (c = U_top' t) and carry the lambda-INDEPENDENT
    residual Grams

        R = T'T - C'C          (split as R_S / R_vS / R_vv below)

    once per block.  Every weighted Gram then corrects in O(s^2) per SNP:

        A_k = [c-space Gram with weights (lam*ev_top + 1)^-k]
              + w_c^k * R,              w_c = 1/(lam*eps + 1)
        sum_{d^k} += n_comp * w_c^k;    sum_logh += n_comp*log(lam*eps + 1)

    ``n_comp`` = n - p_k (static).  Rank-deficient Gram directions keep a
    zero U_top column with ev_top = eps, so shapes stay static and the
    residual picks their mass up at exactly the complement weight.
    """

    eps: jnp.ndarray  # () ridge = the complement eigenvalue
    n_comp: int  # static: n - p_k
    R_S: jnp.ndarray  # (s, s) residual Gram of the shared columns
    R_vS: jnp.ndarray  # (B, s) residual cross terms of the per-SNP column
    R_vv: jnp.ndarray  # (B,)   residual self terms


def _complement_wc(lam, comp: GramComplement):
    """w_c = 1/(lam*eps + 1) and log(lam*eps + 1), shaped like ``lam``."""
    he = lam * comp.eps + 1.0
    return 1.0 / he, jnp.log(he)


def pair_index(s: int) -> Tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (i<=j) index pair arrays for s shared columns."""
    return np.triu_indices(s)


def pair_products(shared: jnp.ndarray) -> jnp.ndarray:
    """Elementwise pair products of the shared columns.

    shared: (n, s)  ->  (n, m) with m = s*(s+1)/2, column order = triu (i<=j).

    This is the batched analogue of GEMMA's ``CalcUab`` precomputation; the
    reference reaches the same quantities one SNP at a time through BLAS
    dsyrk/dsyr calls (pygemma_model.pyx:938-943).
    """
    iu, ju = pair_index(shared.shape[1])
    return shared[:, iu] * shared[:, ju]


def unpack_sym(vec: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse of :func:`pair_products` reduction: (..., m) -> (..., s, s)."""
    iu, ju = pair_index(s)
    out_shape = vec.shape[:-1] + (s, s)
    out = jnp.zeros(out_shape, vec.dtype)
    out = out.at[..., iu, ju].set(vec)
    out = out.at[..., ju, iu].set(vec)
    return out


def _assemble(
    S_k: jnp.ndarray,  # (B, s, s) or (s, s) shared-block Gram
    vS_k: jnp.ndarray,  # (B, s)   per-SNP-column vs shared columns
    vv_k: jnp.ndarray,  # (B,)     per-SNP-column vs itself
    B: int,
    s: int,
) -> jnp.ndarray:
    """Assemble the (B, s+1, s+1) Gram with the per-SNP column last."""
    if S_k.ndim == 2:
        S_k = jnp.broadcast_to(S_k, (B, s, s))
    A = jnp.zeros((B, s + 1, s + 1), S_k.dtype)
    A = A.at[:, :s, :s].set(S_k)
    A = A.at[:, :s, s].set(vS_k)
    A = A.at[:, s, :s].set(vS_k)
    A = A.at[:, s, s].set(vv_k)
    return A


def _complement_correct(grams, sums, ks, comp: "GramComplement", lam,
                        mode: str, want_logh: bool):
    """Fold the implicit complement into c-space Grams/sums (O(s^2)/SNP).

    ``mode`` names the lambda layout: "scalar" (lam (), A (B,t,t), sums
    scalar), "multi" (lam (G,), A (G,B,t,t), sums (G,1)), "per_snp"
    (lam (B,), A (B,t,t), sums (B,)), "slots" (lam (B,R), A (B,R,t,t),
    sums (B,R)).
    """
    wc, logc = _complement_wc(lam, comp)
    B = comp.R_vS.shape[0]
    s = comp.R_S.shape[-1]
    R = _assemble(comp.R_S, comp.R_vS, comp.R_vv, B, s)  # (B, t, t)
    if mode == "scalar":
        eg = es = lambda w: w
    elif mode == "multi":
        eg = lambda w: w[:, None, None, None]
        es = lambda w: w[:, None]
    elif mode == "per_snp":
        eg = lambda w: w[:, None, None]
        es = lambda w: w
    else:  # "slots"
        R = R[:, None]
        eg = lambda w: w[:, :, None, None]
        es = lambda w: w
    nc = float(comp.n_comp)
    # every builder returns grams in ascending-k order (range(1, kmax+1)
    # loops; the fused path sorts explicitly), so sorted(ks) is the right
    # zip order here no matter how the caller spelled ks
    grams = tuple(A + eg(wc ** k) * R for A, k in zip(grams, sorted(ks)))
    sums = GramSums(
        sum_d=sums.sum_d + nc * es(wc),
        sum_d2=sums.sum_d2 + nc * es(wc * wc),
        sum_logh=sums.sum_logh + nc * es(logc)
        if want_logh else sums.sum_logh,
    )
    return grams, sums


def grams_shared_lambda(
    lam: jnp.ndarray,  # scalar
    ev: jnp.ndarray,  # (n,)
    shared: jnp.ndarray,  # (n, s)
    pairs: jnp.ndarray,  # (n, m) = pair_products(shared)
    v: jnp.ndarray,  # (n, B) per-SNP columns
    v2: jnp.ndarray,  # (n, B) = v * v
    ks: Sequence[int],
    want_logh: bool = False,
    comp: "GramComplement" = None,
) -> Tuple[Tuple[jnp.ndarray, ...], GramSums]:
    """Gram tensors with one lambda for the whole SNP block.

    Cost: one (B,n)x(n,s) GEMM and one (B,n)x(n,) matvec per k; the shared
    s x s block is an O(n m) reduction shared by every SNP.
    """
    n, s = shared.shape
    B = v.shape[1]
    h = lam * ev + 1.0
    d = 1.0 / h
    grams = []
    dk = d
    for k in range(1, max(ks) + 1):
        if k in ks:
            S_k = unpack_sym(pdot(pairs.T, dk), s)  # (s, s)
            vS_k = pdot(v.T, dk[:, None] * shared)  # (B, s)
            vv_k = pdot(v2.T, dk)  # (B,)
            grams.append(_assemble(S_k, vS_k, vv_k, B, s))
        dk = dk * d
    sums = GramSums(
        sum_d=jnp.sum(d),
        sum_d2=jnp.sum(d * d),
        sum_logh=jnp.sum(jnp.log(h)) if want_logh else jnp.zeros((), d.dtype),
    )
    if comp is not None:
        return _complement_correct(tuple(grams), sums, ks, comp, lam,
                                   "scalar", want_logh)
    return tuple(grams), sums


def grams_shared_multi(
    lams: jnp.ndarray,  # (G,) grid of lambdas shared across the SNP block
    ev: jnp.ndarray,  # (n,)
    shared: jnp.ndarray,  # (n, s)
    pairs: jnp.ndarray,  # (n, m)
    v: jnp.ndarray,  # (n, B)
    v2: jnp.ndarray,  # (n, B)
    ks: Sequence[int],
    want_logh: bool = False,
    comp: "GramComplement" = None,
) -> Tuple[Tuple[jnp.ndarray, ...], GramSums]:
    """Gram tensors for a whole lambda *grid* at once: (G, B, s+1, s+1).

    The decade sweep (reference pyx:154-174 endpoint scan) evaluated point by
    point reads the genotype block once per (lambda, k); batching every
    (lambda, k) weight column into one wide GEMM reads it exactly once.
    """
    n, s = shared.shape
    B = v.shape[1]
    G = lams.shape[0]
    Kn = len(ks)
    h = lams[:, None] * ev[None, :] + 1.0  # (G, n)
    d = 1.0 / h
    dks = []
    dk = d
    for k in range(1, max(ks) + 1):
        if k in ks:
            dks.append(dk)
        dk = dk * d
    D = jnp.stack(dks, axis=1)  # (G, K, n)

    S = jnp.einsum("gkn,nm->gkm", D, pairs, precision=PRECISE)  # (G, K, m)
    # (n, G*K*s) weighted copies of the shared columns -> single GEMM with v
    C = (D[:, :, :, None] * shared[None, None, :, :]).transpose(2, 0, 1, 3)
    C = C.reshape(n, G * Kn * s)
    vS = pdot(v.T, C).reshape(B, G, Kn, s)  # (B, G, K, s)
    vv = pdot(v2.T, D.reshape(G * Kn, n).T).reshape(B, G, Kn)

    grams = []
    for ki in range(Kn):
        S_k = unpack_sym(S[:, ki], s)  # (G, s, s)
        A = jnp.zeros((G, B, s + 1, s + 1), S_k.dtype)
        A = A.at[:, :, :s, :s].set(S_k[:, None])
        A = A.at[:, :, :s, s].set(vS[:, :, ki].transpose(1, 0, 2))
        A = A.at[:, :, s, :s].set(vS[:, :, ki].transpose(1, 0, 2))
        A = A.at[:, :, s, s].set(vv[:, :, ki].T)
        grams.append(A)
    sums = GramSums(
        sum_d=jnp.sum(d, axis=1)[:, None],  # (G, 1) broadcasts over B
        sum_d2=jnp.sum(d * d, axis=1)[:, None],
        sum_logh=jnp.sum(jnp.log(h), axis=1)[:, None]
        if want_logh
        else jnp.zeros((G, 1), d.dtype),
    )
    if comp is not None:
        return _complement_correct(tuple(grams), sums, ks, comp, lams,
                                   "multi", want_logh)
    return tuple(grams), sums


def grams_per_snp_lambda(
    lam: jnp.ndarray,  # (B,)
    ev: jnp.ndarray,  # (n,)
    shared: jnp.ndarray,  # (n, s)
    pairs: jnp.ndarray,  # (n, m)
    v: jnp.ndarray,  # (n, B)
    v2: jnp.ndarray,  # (n, B)
    ks: Sequence[int],
    want_logh: bool = False,
    comp: "GramComplement" = None,
) -> Tuple[Tuple[jnp.ndarray, ...], GramSums]:
    """Gram tensors with an independent lambda per SNP.

    Cost per k: a (B,n)x(n,m) GEMM for the shared pairs, a (B,n) elementwise
    product plus a (B,n)x(n,s) GEMM for the per-SNP column terms.
    """
    n, s = shared.shape
    B = v.shape[1]
    h = lam[:, None] * ev[None, :] + 1.0  # (B, n)
    d = 1.0 / h
    grams = []
    dk = d
    for k in range(1, max(ks) + 1):
        if k in ks:
            S_k = unpack_sym(pdot(dk, pairs), s)  # (B, s, s)
            zk = v * dk.T  # (n, B)
            vS_k = pdot(zk.T, shared)  # (B, s)
            vv_k = jnp.sum(v2 * dk.T, axis=0)  # (B,)
            grams.append(_assemble(S_k, vS_k, vv_k, B, s))
        dk = dk * d
    sums = GramSums(
        sum_d=jnp.sum(d, axis=1),
        sum_d2=jnp.sum(d * d, axis=1),
        sum_logh=jnp.sum(jnp.log(h), axis=1)
        if want_logh
        else jnp.zeros((B,), d.dtype),
    )
    if comp is not None:
        return _complement_correct(tuple(grams), sums, ks, comp, lam,
                                   "per_snp", want_logh)
    return tuple(grams), sums


def grams_per_snp_lambda_fused(
    lam: jnp.ndarray,  # (B,) or (B, R) -- R lambda slots per SNP
    ev: jnp.ndarray,  # (n,)
    shared: jnp.ndarray,  # (n, s)
    pairs: jnp.ndarray,  # (n, m)
    v: jnp.ndarray,  # (n, B) per-SNP columns (natural genotype layout)
    ks: Sequence[int],
    want_logh: bool = False,
    comp: "GramComplement" = None,
) -> Tuple[Tuple[jnp.ndarray, ...], GramSums]:
    """Pallas-fused variant of :func:`grams_per_snp_lambda` (TPU only).

    Same numerical contract; the (n, B) weight matrices never touch HBM
    (see pygemma_tpu/ops/gram_kernel.py).  With a 2-D ``lam`` all R slots
    share one pass over the genotype columns; Gram tensors come back with a
    slot axis: (B, R, s+1, s+1).
    """
    from ..ops.gram_kernel import fused_grams

    n, s = shared.shape
    kmax = max(ks)
    S, vS, vv, sum_d, sum_d2, sum_logh = fused_grams(
        lam, ev, pairs, shared, v, kmax, want_logh
    )
    grams = []
    # ascending-k order, matching the non-fused builders (which iterate
    # range(1, kmax+1)) and _complement_correct's sorted(ks) zip -- an
    # unsorted caller ks must never reorder the returned tuple
    for k in sorted(ks):
        S_k = unpack_sym(S[..., k - 1, :], s)
        grams.append(
            _assemble_nd(S_k, vS[..., k - 1, :], vv[..., k - 1])
        )
    sums = GramSums(sum_d=sum_d, sum_d2=sum_d2, sum_logh=sum_logh)
    if comp is not None:
        # the complement correction stays OUTSIDE the Pallas kernel: it is
        # O(s^2) per (SNP, slot) VPU work that XLA fuses on its own
        return _complement_correct(
            tuple(grams), sums, ks, comp, lam,
            "per_snp" if lam.ndim == 1 else "slots", want_logh,
        )
    return tuple(grams), sums


def grams_per_snp_lambda_slots(
    lam: jnp.ndarray,  # (B, R)
    ev: jnp.ndarray,
    shared: jnp.ndarray,
    pairs: jnp.ndarray,
    v: jnp.ndarray,
    v2: jnp.ndarray,
    ks: Sequence[int],
    want_logh: bool = False,
    comp: "GramComplement" = None,
) -> Tuple[Tuple[jnp.ndarray, ...], GramSums]:
    """XLA fallback for multi-slot lambda: per-slot builds stacked on axis 1."""
    parts = [
        grams_per_snp_lambda(lam[:, r], ev, shared, pairs, v, v2, ks,
                             want_logh=want_logh, comp=comp)
        for r in range(lam.shape[1])
    ]
    grams = tuple(
        jnp.stack([p[0][i] for p in parts], axis=1)
        for i in range(len(parts[0][0]))
    )
    sums = GramSums(
        sum_d=jnp.stack([p[1].sum_d for p in parts], axis=1),
        sum_d2=jnp.stack([p[1].sum_d2 for p in parts], axis=1),
        sum_logh=jnp.stack([p[1].sum_logh for p in parts], axis=1),
    )
    return grams, sums


def _assemble_nd(S_k, vS_k, vv_k):
    """(..., s, s) + (..., s) + (...,) -> (..., s+1, s+1), per-SNP col last."""
    s = S_k.shape[-1]
    batch = S_k.shape[:-2]
    A = jnp.zeros(batch + (s + 1, s + 1), S_k.dtype)
    A = A.at[..., :s, :s].set(S_k)
    A = A.at[..., :s, s].set(vS_k)
    A = A.at[..., s, :s].set(vS_k)
    A = A.at[..., s, s].set(vv_k)
    return A


def permute_x_before_y(A: jnp.ndarray, c: int) -> jnp.ndarray:
    """Reorder a Gram built with shared=[W, y], per-SNP=x into [W, x, y] order.

    After this, the alternative design [W, x] occupies the first c+1 indices
    and the outcome y is last -- the layout :mod:`pygemma_tpu.core.reml`
    expects.  DE mode (reference lmm/lmm.py:498-532) skips this permutation:
    there the design is [W, y] and the outcome is the genotype column.
    """
    t = A.shape[-1]  # == c + 2
    perm = list(range(c)) + [t - 1, c]
    perm = jnp.asarray(perm)
    return A[..., perm, :][..., :, perm]
