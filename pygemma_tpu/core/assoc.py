"""Per-block association testing: Wald / LRT / score, batched over SNPs.

This is the TPU replacement for the reference's per-SNP worker loop
(``calculate`` / ``calculate_de``, reference lmm/lmm.py:461-532): a single
jit-compiled function maps a block of rotated genotype columns to per-SNP
statistics.  Per-SNP failure containment (reference catches LinAlgError and
emits a NaN row, lmm/lmm.py:484-493) falls out naturally: a singular design
makes the batched Cholesky produce NaNs for that SNP only.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GwasConfig, MIN_VAL
from . import reml
from .grams import (
    GramComplement,
    grams_per_snp_lambda,
    grams_per_snp_lambda_fused,
    grams_shared_lambda,
    pair_products,
    pdot,
    permute_x_before_y,
)
from .solver import LambdaProblem, solve_lambda


#: phenotype batches up to this size are trace-time-unrolled (keeping the
#: fused kernel) instead of vmapped; beyond it compile time would balloon
_MULTI_UNROLL = 12


def _use_fused(cfg: GwasConfig, dtype) -> bool:
    """Resolve the fused-kernel switch at trace time."""
    if cfg.use_fused_kernel is not None:
        return cfg.use_fused_kernel
    return jax.default_backend() != "cpu" and dtype == jnp.float32


class NullFit(NamedTuple):
    """Null-model (no SNP) quantities shared by a whole phenotype's scan."""

    lambda_reml: jnp.ndarray  # () REML lambda under y ~ W
    lambda_ml: jnp.ndarray  # () ML lambda under y ~ W
    loglik_ml: jnp.ndarray  # () ML log-likelihood at lambda_ml


class ImplicitCtx(NamedTuple):
    """Implicit low-rank kinship context for one association block.

    Marks that ``ev``/``W``/``y``/``X`` handed to :func:`assoc_block` live
    in the p_k-dimensional TOP eigenspace (rotated by U_top only; see
    core/lowrank.py::ImplicitBasis) and carries the raw (unrotated) Gram
    terms the complement correction needs.  ``S_raw`` is the (s, s) Gram of
    the raw [W, y] columns; ``vS_raw``/``vv_raw`` are the raw genotype
    cross/self terms, all lambda-independent and computed once per block.
    """

    eps: jnp.ndarray  # () complement eigenvalue (the kinship ridge)
    n_total: int  # static: TRUE sample count n
    S_raw: jnp.ndarray  # (s, s)
    vS_raw: jnp.ndarray  # (B, s)
    vv_raw: jnp.ndarray  # (B,)


class ImplicitMultiCtx(NamedTuple):
    """Implicit low-rank context shared by a multi-phenotype block.

    The raw Gram pieces factor over phenotypes -- W-blocks are shared and
    only the y column varies -- so the batched scan carries them split and
    assembles a per-phenotype :class:`ImplicitCtx` at trace time.
    """

    eps: jnp.ndarray  # ()
    n_total: int  # static
    WtW: jnp.ndarray  # (c, c) raw covariate Gram
    WtY: jnp.ndarray  # (c, k) raw covariate x phenotype cross terms
    YtY: jnp.ndarray  # (k,)   raw phenotype self terms
    XtW: jnp.ndarray  # (B, c) raw genotype x covariate cross terms
    XtY: jnp.ndarray  # (B, k) raw genotype x phenotype cross terms
    vv: jnp.ndarray  # (B,)   raw genotype self terms


def _implicit_for_pheno(m: ImplicitMultiCtx, wty, yty, xty) -> ImplicitCtx:
    """Assemble one phenotype's ImplicitCtx from the factored raw terms.

    wty: (c,) raw W'y; yty: () raw y'y; xty: (B,) raw X'y.
    """
    c = m.WtW.shape[0]
    S_raw = jnp.zeros((c + 1, c + 1), m.WtW.dtype)
    S_raw = S_raw.at[:c, :c].set(m.WtW)
    S_raw = S_raw.at[:c, c].set(wty)
    S_raw = S_raw.at[c, :c].set(wty)
    S_raw = S_raw.at[c, c].set(yty)
    vS_raw = jnp.concatenate([m.XtW, xty[:, None]], axis=1)
    return ImplicitCtx(m.eps, m.n_total, S_raw, vS_raw, m.vv)


def _implicit_complement(implicit: ImplicitCtx, shared_c: jnp.ndarray,
                         C_x: jnp.ndarray) -> GramComplement:
    """Residual Grams R = T'T - C'C over columns [shared | x].

    Exact in infinite precision because U_top's columns are orthonormal;
    computed at Precision.HIGH like every other Gram contraction.
    """
    R_S = implicit.S_raw - pdot(shared_c.T, shared_c)
    R_vS = implicit.vS_raw - pdot(C_x.T, shared_c)
    R_vv = implicit.vv_raw - jnp.sum(C_x * C_x, axis=0)
    n_comp = implicit.n_total - shared_c.shape[0]
    return GramComplement(implicit.eps, n_comp, R_S, R_vS, R_vv)


class AssocResult(NamedTuple):
    beta: jnp.ndarray
    se_beta: jnp.ndarray
    tau: jnp.ndarray
    lam: jnp.ndarray
    F_wald: jnp.ndarray
    p_wald: jnp.ndarray
    p_lrt: Optional[jnp.ndarray]
    p_score: Optional[jnp.ndarray]
    F_score: Optional[jnp.ndarray]
    lambda_ml: Optional[jnp.ndarray]
    logl_H1: Optional[jnp.ndarray]


def f_sf(F, dfd):
    """Survival function of F(1, dfd) via the regularized incomplete beta.

    Device-side analogue of the reference's scipy ``stats.f.sf``
    (lmm/lmm.py:482); the driver recomputes p-values on host in float64 for
    the output table, so this is used by jit-only consumers (and kept for
    parity checks).
    """
    F = jnp.maximum(F, 0.0)
    x = dfd / (dfd + F)
    return jax.scipy.special.betainc(dfd / 2.0, 0.5, x)


def chi2_sf_1df(x):
    """chi^2(1) survival function: p = Gamma_upper(1/2, x/2)/Gamma(1/2)."""
    return jax.scipy.special.gammaincc(0.5, jnp.maximum(x, 0.0) / 2.0)


def fit_null(ev, W, y, cfg: GwasConfig,
             implicit: Optional[ImplicitCtx] = None) -> NullFit:
    """Fit the null model y ~ W once per phenotype (for score/LRT tests).

    With ``implicit``, W/y are U_top-rotated and ``implicit.S_raw`` is the
    raw (s, s) Gram of [W, y]; the null-design residuals are carved out of
    it (shared = W, outcome = y).
    """
    n, c = W.shape
    comp = None
    if implicit is not None:
        n = implicit.n_total
        full_c = jnp.concatenate([W, y[:, None]], axis=1)  # (p_k, c+1)
        R_full = implicit.S_raw - pdot(full_c.T, full_c)
        comp = GramComplement(
            implicit.eps, implicit.n_total - W.shape[0],
            R_full[:c, :c], R_full[c:c + 1, :c], R_full[c, c][None],
        )
    pairs = pair_products(W)
    v = y[:, None]
    v2 = v * v
    prob_reml = LambdaProblem(ev, W, pairs, v, v2, n, c, False, True,
                              comp=comp)
    lam_reml, _ = solve_lambda(prob_reml, cfg)
    prob_ml = LambdaProblem(ev, W, pairs, v, v2, n, c, False, False,
                            comp=comp)
    lam_ml, logl_ml = solve_lambda(prob_ml, cfg)
    return NullFit(lam_reml[0], lam_ml[0], logl_ml[0])


def assoc_block(
    ev: jnp.ndarray,  # (n,) clamped kinship eigenvalues (or (p_k,) implicit)
    W: jnp.ndarray,  # (n, c) rotated covariates
    y: jnp.ndarray,  # (n,) rotated phenotype
    X: jnp.ndarray,  # (n, B) rotated genotype block
    cfg: GwasConfig,
    null: Optional[NullFit] = None,
    de: bool = False,
    implicit: Optional[ImplicitCtx] = None,
) -> AssocResult:
    """Run the LMM association tests for one SNP block.

    Standard mode fits  y = W a + x b + u + e  per SNP x; DE mode
    (reference lmm/lmm.py:498-532) swaps roles and fits  x = W a + y b + u + e.
    With ``implicit`` the inputs are U_top-rotated (p_k rows) and the
    complement enters through lambda-independent residual Grams.
    """
    n, c = W.shape
    if implicit is not None:
        n = implicit.n_total
    B = X.shape[1]
    dtype = X.dtype
    shared = jnp.concatenate([W, y[:, None]], axis=1)  # (n, c+1): [W, y]
    pairs = pair_products(shared)
    X2 = X * X
    fused = _use_fused(cfg, dtype)
    comp = (
        _implicit_complement(implicit, shared, X)
        if implicit is not None else None
    )

    # Lambda optimization with the full design.  Standard: design [W, x]
    # (permuted Gram order [W, x, y]); DE: design [W, y], outcome x.
    prob = LambdaProblem(
        ev, shared, pairs, X, X2, n, c + 1, not de, True, fused, comp
    )
    lam_star, _ = solve_lambda(prob, cfg)

    # Final statistics at lambda*: one k=1 Gram build.
    if fused:
        grams, sums = grams_per_snp_lambda_fused(
            lam_star, ev, shared, pairs, X, (1,), want_logh=False, comp=comp
        )
    else:
        grams, sums = grams_per_snp_lambda(
            lam_star, ev, shared, pairs, X, X2, (1,), want_logh=False,
            comp=comp
        )
    A1 = grams[0]
    if not de:
        A1 = permute_x_before_y(A1, c)
    # Predictor-of-interest quadratic forms against the null design W
    # (reference calc_beta_vg_ve_restricted_overload, pyx:1514-1537).
    xPx, xPy, _ = reml.predictor_terms(A1, c)
    alt = reml.reml_scalars(A1, None, None, sums, c + 1)
    yPxy = jnp.maximum(alt.yPy, MIN_VAL)

    df = float(n - c - 1)
    # Degenerate predictors (x collinear with W, e.g. a constant SNP) have
    # x'P_c x == 0 up to roundoff -- possibly EXACTLY zero or negative on
    # the implicit path, where beta = xPy/xPx would emit inf and a p = 0
    # false positive.  The reference's contract for a singular design is a
    # NaN row (LinAlgError catch, lmm/lmm.py:484-493); reproduce it here.
    x_ok = xPx > MIN_VAL
    nan = jnp.asarray(jnp.nan, dtype)
    beta = jnp.where(x_ok, xPy / jnp.maximum(xPx, MIN_VAL), nan)
    # the reference's contract for a singular design is a FULL NaN row
    # (every column, lmm/lmm.py:484-493): gate the remaining per-SNP
    # outputs on the same mask so se/tau/lambda never report finite values
    # for a SNP whose beta/p are NaN
    se_beta = jnp.where(
        x_ok,
        jnp.sqrt(yPxy) / (jnp.sqrt(jnp.maximum(xPx, MIN_VAL))
                          * math.sqrt(df)),
        nan,
    )
    tau = jnp.where(x_ok, df / yPxy, nan)
    lam_star = jnp.where(x_ok, lam_star, nan)
    F_wald = jnp.square(beta / se_beta)
    p_wald = f_sf(F_wald, df)

    p_lrt = logl_H1 = lam_ml = None
    if "lrt" in cfg.tests:
        # GEMMA -lmm 2: ML lambda per SNP, D = 2(l1 - l0), chi^2(1).
        prob_ml = LambdaProblem(
            ev, shared, pairs, X, X2, n, c + 1, not de, False, fused, comp
        )
        lam_ml, logl_H1 = solve_lambda(prob_ml, cfg)
        assert null is not None, "LRT requires a null-model fit"
        D = 2.0 * (logl_H1 - null.loglik_ml)
        p_lrt = jnp.where(x_ok, chi2_sf_1df(D), nan)
        lam_ml = jnp.where(x_ok, lam_ml, nan)
        logl_H1 = jnp.where(x_ok, logl_H1, nan)

    p_score = F_score = None
    if "score" in cfg.tests:
        # GEMMA -lmm 3: score statistic at the null REML lambda.
        assert null is not None, "score test requires a null-model fit"
        grams0, _ = grams_shared_lambda(
            null.lambda_reml.astype(dtype), ev, shared, pairs, X, X2, (1,),
            comp=comp,
        )
        A1s = grams0[0]
        if not de:
            A1s = permute_x_before_y(A1s, c)
        sxPx, sxPy, syPy = reml.predictor_terms(A1s, c)
        # degenerate predictor -> NaN, not p = 0; ALSO gated on the Wald
        # x_ok mask: the null-lambda xPx can sit just above the absolute
        # MIN_VAL clamp by f32 roundoff while the SNP is exactly collinear,
        # and the reference's singular-design contract is a FULL NaN row
        F_score = jnp.where(
            x_ok & (sxPx > MIN_VAL),
            n * jnp.square(sxPy) / (jnp.maximum(syPy * sxPx, MIN_VAL)),
            nan,
        )
        p_score = f_sf(F_score, df)

    return AssocResult(
        beta=beta,
        se_beta=se_beta,
        tau=tau,
        lam=lam_star,
        F_wald=F_wald,
        p_wald=p_wald,
        p_lrt=p_lrt,
        p_score=p_score,
        F_score=F_score,
        lambda_ml=lam_ml,
        logl_H1=logl_H1,
    )


def assoc_block_multi(
    ev: jnp.ndarray,  # (n,)
    W: jnp.ndarray,  # (n, c)
    Y_kn: jnp.ndarray,  # (k, n) rotated phenotypes (e.g. genes in an eQTL scan)
    X: jnp.ndarray,  # (n, B)
    cfg: GwasConfig,
    null_stack: Optional[jnp.ndarray] = None,  # (k, 3) stacked NullFit rows
    de: bool = False,
    implicit_multi: Optional[ImplicitMultiCtx] = None,
):
    """Vectorize the association block over phenotypes.

    One compiled executable scans every phenotype against the block -- the
    TPU answer to the reference's per-gene SLURM array
    (experiments/1000G/run_pyGEMMA.sh:43-52).  Small phenotype batches
    (k <= _MULTI_UNROLL) are unrolled as a Python loop at trace time so each
    phenotype keeps the fused Pallas kernel (Pallas has no vmap batching
    rule); larger batches fall back to a vmapped XLA path, where callers
    should shrink the SNP block by ~k to keep the (k, B, n) weight temps in
    HBM.  Returns a dict of (k, B) arrays.
    """
    k_pheno = Y_kn.shape[0]

    def ictx_for(g_or_cols):
        if implicit_multi is None:
            return None
        wty, yty, xty = g_or_cols
        return _implicit_for_pheno(implicit_multi, wty, yty, xty)

    if k_pheno <= _MULTI_UNROLL and _use_fused(cfg, X.dtype):
        outs = []
        for g in range(k_pheno):
            null = None
            if null_stack is not None:
                null = NullFit(
                    null_stack[g, 0], null_stack[g, 1], null_stack[g, 2]
                )
            ictx = None
            if implicit_multi is not None:
                m = implicit_multi
                ictx = ictx_for((m.WtY[:, g], m.YtY[g], m.XtY[:, g]))
            res = assoc_block(ev, W, Y_kn[g], X, cfg, null=null, de=de,
                              implicit=ictx)
            outs.append(
                {k: v for k, v in res._asdict().items() if v is not None}
            )
        return {
            k: jnp.stack([o[k] for o in outs]) for k in outs[0]
        }

    cfg_v = cfg.replace(use_fused_kernel=False)

    if implicit_multi is not None:
        m = implicit_multi

        if null_stack is not None:
            def one_i(y, null_row, wty, yty, xty):
                null = NullFit(null_row[0], null_row[1], null_row[2])
                res = assoc_block(ev, W, y, X, cfg_v, null=null, de=de,
                                  implicit=ictx_for((wty, yty, xty)))
                return {k: v for k, v in res._asdict().items()
                        if v is not None}

            return jax.vmap(one_i)(Y_kn, null_stack, m.WtY.T, m.YtY,
                                   m.XtY.T)

        def one_i(y, wty, yty, xty):
            res = assoc_block(ev, W, y, X, cfg_v, de=de,
                              implicit=ictx_for((wty, yty, xty)))
            return {k: v for k, v in res._asdict().items() if v is not None}

        return jax.vmap(one_i)(Y_kn, m.WtY.T, m.YtY, m.XtY.T)

    if null_stack is not None:
        def one(y, null_row):
            null = NullFit(null_row[0], null_row[1], null_row[2])
            res = assoc_block(ev, W, y, X, cfg_v, null=null, de=de)
            return {k: v for k, v in res._asdict().items() if v is not None}

        return jax.vmap(one)(Y_kn, null_stack)

    def one(y):
        res = assoc_block(ev, W, y, X, cfg_v, de=de)
        return {k: v for k, v in res._asdict().items() if v is not None}

    return jax.vmap(one)(Y_kn)


def fit_null_multi(ev, W, Y_kn, cfg: GwasConfig,
                   implicit_multi: Optional[ImplicitMultiCtx] = None
                   ) -> jnp.ndarray:
    """vmap of :func:`fit_null` over phenotypes -> (k, 3) stacked rows."""
    if implicit_multi is not None:
        m = implicit_multi
        c = m.WtW.shape[0]

        def one_i(y, wty, yty):
            S_raw = jnp.zeros((c + 1, c + 1), m.WtW.dtype)
            S_raw = S_raw.at[:c, :c].set(m.WtW)
            S_raw = S_raw.at[:c, c].set(wty)
            S_raw = S_raw.at[c, :c].set(wty)
            S_raw = S_raw.at[c, c].set(yty)
            # per-SNP residual fields are unused by the null fit
            ictx = ImplicitCtx(m.eps, m.n_total, S_raw,
                               jnp.zeros((1, c + 1), S_raw.dtype),
                               jnp.zeros((1,), S_raw.dtype))
            nf = fit_null(ev, W, y, cfg, implicit=ictx)
            return jnp.stack([nf.lambda_reml, nf.lambda_ml, nf.loglik_ml])

        return jax.vmap(one_i)(Y_kn, m.WtY.T, m.YtY)

    def one(y):
        nf = fit_null(ev, W, y, cfg)
        return jnp.stack([nf.lambda_reml, nf.lambda_ml, nf.loglik_ml])

    return jax.vmap(one)(Y_kn)
