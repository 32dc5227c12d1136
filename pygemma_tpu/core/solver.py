"""Vectorized variance-ratio (lambda) optimizer, batched over SNPs.

The reference optimizes lambda per SNP with data-dependent control flow:
decade-bracket scan -> scipy brentq (rtol=0.1) -> safeguarded Newton
(reference pygemma_model/pygemma_model.pyx:135-194, :1349-1416).  That shape
is hostile to XLA, so here the same semantics are recast as fixed-iteration
masked updates over the whole SNP block:

1.  Evaluate d ell/d lambda at the 11 decade points 10^-5..10^5 with a
    *shared* lambda (pure-GEMM path) and detect sign changes per SNP.
2.  For EVERY sign-change bracket per SNP (exactly like the reference's
    sequential bracket scan; an optional ``cfg.max_roots`` cap exists for
    benchmarking), run a fixed number of masked bisection steps (replacing
    brentq) followed by masked safeguarded Newton steps replicating the
    reference's stopping rules (ratio-sign break, bracket clamping,
    rel-tol 1e-5; pyx:1392-1411).  Root problems are refined in compacted
    batches of B lanes, so blocks with few roots pay for one pass and
    blocks with none pay for nothing.
3.  Evaluate the (restricted) likelihood at every refined root plus the two
    bracket endpoints and keep the argmax -- the reference's multi-root
    resolution (pyx:186-194) -- with candidate order chosen so argmax
    tie-breaking matches the reference's strict-improvement scan.

``grid=True`` reproduces the pure grid search (pyx:99-132).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GwasConfig
from . import reml
from .grams import (
    GramComplement,
    grams_per_snp_lambda,
    grams_per_snp_lambda_fused,
    grams_per_snp_lambda_slots,
    grams_shared_lambda,
    grams_shared_multi,
    permute_x_before_y,
)


class LambdaProblem(NamedTuple):
    """One lambda-optimization problem over a block of B per-SNP columns.

    ``shared``: (n, s) columns shared across the block; ``v``: (n, B) per-SNP
    column; ``pairs``: pair products of ``shared``.  ``q`` is the design width
    the projection removes; with ``permute=True`` the design is
    [shared[:, :q-1], v] (standard GWAS: shared=[W, y], v=x, design=[W, x]);
    with ``permute=False`` it is shared[:, :q] (null model / DE mode).
    ``restricted`` selects REML vs ML.  ``fused=True`` routes per-SNP-lambda
    evaluations through the Pallas fused Gram kernel (TPU only).

    ``comp`` (optional) marks an IMPLICIT low-rank problem: ``ev``/``shared``
    /``pairs``/``v``/``v2`` then live in the p_k-dimensional top eigenspace
    (rotated by U_top only) while ``comp`` carries the complement eigenvalue
    and the lambda-independent residual Grams (see
    :class:`pygemma_tpu.core.grams.GramComplement`); ``n`` stays the TRUE
    sample count.
    """

    ev: jnp.ndarray
    shared: jnp.ndarray
    pairs: jnp.ndarray
    v: jnp.ndarray
    v2: jnp.ndarray
    n: int
    q: int
    permute: bool
    restricted: bool
    fused: bool = False
    comp: Optional[GramComplement] = None


_KS = {"d1": (1, 2), "newton": (1, 2, 3), "lik": (1,)}


def evaluate(problem: LambdaProblem, lam, need: str, shared_lam):
    """Evaluate d1 / (d1, d2) / loglik at ``lam`` for every SNP in the block.

    ``shared_lam=True`` takes a scalar lambda (GEMM fast path);
    ``shared_lam="multi"`` takes a (G,) lambda grid and returns (G, B)
    outputs from one wide GEMM; otherwise ``lam`` is (B,).
    """
    ks = _KS[need]
    want_logh = need == "lik"
    if shared_lam == "multi":
        grams, sums = grams_shared_multi(
            lam, problem.ev, problem.shared, problem.pairs, problem.v,
            problem.v2, ks, want_logh=want_logh, comp=problem.comp,
        )
        lam = lam[:, None]  # broadcast (G, 1) against (G, B) scalars
    elif shared_lam:
        grams, sums = grams_shared_lambda(
            lam, problem.ev, problem.shared, problem.pairs, problem.v,
            problem.v2, ks, want_logh=want_logh, comp=problem.comp,
        )
    elif problem.fused:
        grams, sums = grams_per_snp_lambda_fused(
            lam, problem.ev, problem.shared, problem.pairs, problem.v,
            ks, want_logh=want_logh, comp=problem.comp,
        )
    elif lam.ndim == 2:
        # (B, R) lambda slots, XLA fallback
        grams, sums = grams_per_snp_lambda_slots(
            lam, problem.ev, problem.shared, problem.pairs, problem.v,
            problem.v2, ks, want_logh=want_logh, comp=problem.comp,
        )
    else:
        grams, sums = grams_per_snp_lambda(
            lam, problem.ev, problem.shared, problem.pairs, problem.v,
            problem.v2, ks, want_logh=want_logh, comp=problem.comp,
        )
    if problem.permute:
        c = problem.q - 1
        grams = tuple(permute_x_before_y(A, c) for A in grams)
    A1 = grams[0]
    A2 = grams[1] if len(grams) > 1 else None
    A3 = grams[2] if len(grams) > 2 else None
    scal = reml.reml_scalars(
        A1, A2, A3, sums, problem.q, need_third=(need == "newton")
    )
    n, q = problem.n, problem.q
    if need == "lik":
        if problem.restricted:
            return reml.loglik_restricted(
                lam, n, q, scal.yPy, sums.sum_logh, scal.logdet_G1
            )
        return reml.loglik_ml(lam, n, scal.yPy, sums.sum_logh)
    if need == "d1":
        if problem.restricted:
            return reml.d1_restricted(lam, n, q, scal.yPy, scal.yPPy, scal.trP)
        return reml.d1_ml(lam, n, scal.yPy, scal.yPPy, sums.sum_d)
    # need == "newton"
    if problem.restricted:
        d1 = reml.d1_restricted(lam, n, q, scal.yPy, scal.yPPy, scal.trP)
        d2 = reml.d2_restricted(
            lam, n, q, scal.yPy, scal.yPPy, scal.yPPPy, scal.trP, scal.trPP
        )
    else:
        d1 = reml.d1_ml(lam, n, scal.yPy, scal.yPPy, sums.sum_d)
        d2 = reml.d2_ml(
            lam, n, scal.yPy, scal.yPPy, scal.yPPPy, sums.sum_d, sums.sum_d2
        )
    return d1, d2


def _sign(x):
    """Sign with sign(0) = +1, mirroring copysignf(1.0, x) (pyx:174)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def solve_lambda(problem: LambdaProblem, cfg: GwasConfig):
    """Return (lambda_star, loglik_star), each (B,)."""
    dtype = problem.v.dtype
    B = problem.v.shape[1]
    lo_pow = cfg.lambda_pow_low
    hi_pow = cfg.lambda_pow_high
    n_grid = cfg.n_grid
    decades = [10.0 ** (lo_pow + i) for i in range(n_grid)]
    ep_low = jnp.asarray(decades[0], dtype)
    ep_high = jnp.asarray(decades[-1], dtype)

    if cfg.grid:
        # Reference grid path (pyx:99-132): endpoints first (low endpoint wins
        # ties), then each decade point with strict improvement.
        cand = [decades[0], decades[-1]] + decades[:-1]
        liks = evaluate(
            problem, jnp.asarray(cand, dtype), "lik", "multi"
        )  # (n_cand, B)
        liks = jnp.broadcast_to(liks, (len(cand), B)).T
        best = jnp.argmax(liks, axis=1)
        lam_star = jnp.asarray(cand, dtype)[best]
        return lam_star, jnp.take_along_axis(liks, best[:, None], 1)[:, 0]

    # --- stage 1: one wide-GEMM decade sweep of d1 -------------------------
    d1_grid = evaluate(
        problem, jnp.asarray(decades, dtype), "d1", "multi"
    )  # (n_grid, B)
    d1_grid = jnp.broadcast_to(d1_grid, (n_grid, B)).T  # (B, n_grid)
    signs = _sign(d1_grid)
    sc = signs[:, :-1] * signs[:, 1:] < 0  # (B, n_grid - 1) sign changes

    # --- stage 2: stage the sign-change brackets per SNP --------------------
    # max_roots=0 (default) stages EVERY decade bracket, matching the
    # reference's exhaustive bracket scan (pyx:154-194); a positive value
    # caps the brackets refined per SNP.
    n_brk = n_grid - 1
    R = min(cfg.max_roots, n_brk) if cfg.max_roots > 0 else n_brk
    order = jnp.argsort(~sc, axis=1, stable=True)[:, :R]  # (B, R)
    valid = jnp.take_along_axis(sc, order, axis=1)  # (B, R)
    pow_lo = lo_pow + order.astype(dtype)
    lo0 = jnp.power(jnp.asarray(10.0, dtype), pow_lo)
    hi0 = jnp.power(jnp.asarray(10.0, dtype), pow_lo + 1.0)
    sign_lo = jnp.take_along_axis(signs, order, axis=1)

    ep_liks = evaluate(
        problem, jnp.asarray([decades[0], decades[-1]], dtype), "lik", "multi"
    )  # (2, B)
    ep_liks = jnp.broadcast_to(ep_liks, (2, B))

    # --- stages 3-5: root refinement in compacted batches.  Every eval
    # takes a (B, r) lambda tensor; the fused kernel reads the genotype rows
    # once for all slots.  Refinement cost scales with lanes x slots, but
    # most SNPs contribute at most one sign-change bracket and many
    # contribute none -- so every (snp, bracket) root problem is *gathered*
    # into the lanes of a single-slot (B, 1) problem and a while_loop walks
    # ceil(total_roots / B) such batches (zero iterations when the block has
    # no roots at all).  Dead lanes and dead slots cost nothing, and results
    # are bit-identical to refining every bracket in place: compaction only
    # changes *where* each root is computed, not *what* is computed.
    def refine_body(problem, lo0_r, hi0_r, valid_r, flo):
        """Bisection + Newton + likelihood for one slot layout (B, r)."""

        def bisect_body(_, state):
            # masked GEOMETRIC bisection (replaces brentq, pyx:176-182).
            # Brackets are decades, so the geometric midpoint sqrt(lo*hi)
            # halves the bracket's log-width each step: after k iterations
            # the bracket RATIO is 10^(1/2^k) uniformly over the decade --
            # matching brentq's rtol=0.1 (a *relative* tolerance) even for
            # roots near the decade's low edge, where linear bisection
            # needs twice the iterations.
            lo, hi = state
            mid = jnp.sqrt(lo * hi)
            sm = _sign(evaluate(problem, mid, "d1", False))
            go_right = sm == flo  # root is in [mid, hi]
            return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

        lo, hi = jax.lax.fori_loop(
            0, cfg.bisect_iters, bisect_body, (lo0_r, hi0_r)
        )
        lam_r = jnp.sqrt(lo * hi)

        def newton_cond(state):
            # early exit once every lane has stopped -- updates are masked,
            # so stopping early is bit-identical to running all iterations.
            i, _, done = state
            return (i < cfg.newton_iters) & ~jnp.all(done)

        def newton_body(state):
            # masked safeguarded Newton (pyx:1349-1416)
            i, lam_r, done = state
            d1, d2 = evaluate(problem, lam_r, "newton", False)
            ratio = d1 / d2
            # pyx:1392 -- stop without updating when the three-way sign
            # product is <= 0 (covers d1==0, d2==0; NaN falls through to the
            # NaN guard exactly as in the reference).
            bad_sign = (jnp.sign(ratio) * jnp.sign(d1) * jnp.sign(d2)) <= 0
            cand = lam_r - ratio
            bad_num = jnp.isnan(cand) | jnp.isinf(cand)
            # pyx:1398-1404 -- an out-of-bracket step BREAKS WITHOUT
            # updating: the clamp assignment there is dead (lambda_root
            # keeps the previous iterate), so out-of-bracket is just
            # another stop condition here.
            oob = (cand < lo0_r) | (cand > hi0_r)
            rel = jnp.abs(cand - lam_r) / jnp.abs(lam_r)
            do_upd = (~done) & (~bad_sign) & (~bad_num) & (~oob)
            new_lam = jnp.where(do_upd, cand, lam_r)
            newly_done = bad_sign | bad_num | oob | (rel < cfg.newton_rtol)
            return i + 1, new_lam, done | newly_done

        _, lam_r, _ = jax.lax.while_loop(
            newton_cond, newton_body, (jnp.asarray(0), lam_r, ~valid_r)
        )

        # likelihood at the refined roots (pyx:186-188)
        lik_r = evaluate(problem, lam_r, "lik", False)  # (B, r)
        lik_r = jnp.where(valid_r, lik_r, -jnp.inf)
        return lam_r, lik_r

    # Lane l of a compacted batch works on SNP sel[l] // R, bracket slot
    # sel[l] % R; lanes past the last root are masked invalid (their Newton
    # state starts "done" and their likelihood is forced to -inf).  Each
    # flat slot appears in exactly one batch (disjoint stable-sort rank
    # ranges), so scatters never collide; an invalid lane writes the same
    # (lambda = 1, -inf) an untouched slot already holds.
    flat_valid = valid.reshape(-1)  # (B * R,) SNP-major
    sorted_idx = jnp.argsort(~flat_valid, stable=True)  # roots first
    total_roots = jnp.sum(flat_valid)
    n_batches = (total_roots + B - 1) // B
    lo0_f = lo0.reshape(-1)
    hi0_f = hi0.reshape(-1)
    flo_f = sign_lo.reshape(-1)

    def batch_cond(state):
        return state[0] < n_batches

    def batch_body(state):
        k, lam_f, lik_f = state
        sel = jax.lax.dynamic_slice(sorted_idx, (k * B,), (B,))
        snp_idx = sel // R
        valid_c = flat_valid[sel][:, None]  # (B, 1)
        comp_c = None
        if problem.comp is not None:
            # the per-SNP residual terms travel with their lanes
            comp_c = problem.comp._replace(
                R_vS=problem.comp.R_vS[snp_idx],
                R_vv=problem.comp.R_vv[snp_idx],
            )
        prob_c = problem._replace(
            v=problem.v[:, snp_idx], v2=problem.v2[:, snp_idx], comp=comp_c
        )
        lam_c, lik_c = refine_body(
            prob_c, lo0_f[sel][:, None], hi0_f[sel][:, None],
            valid_c, flo_f[sel][:, None],
        )
        lam_f = lam_f.at[sel].set(jnp.where(valid_c[:, 0], lam_c[:, 0],
                                            jnp.asarray(1.0, dtype)))
        lik_f = lik_f.at[sel].set(lik_c[:, 0])
        return k + 1, lam_f, lik_f

    _, lam_f, lik_f = jax.lax.while_loop(
        batch_cond, batch_body,
        (
            jnp.zeros((), total_roots.dtype),
            jnp.ones((B * R,), dtype),
            jnp.full((B * R,), -jnp.inf, dtype),
        ),
    )
    lam_r = lam_f.reshape(B, R)
    lik_r = lik_f.reshape(B, R)

    # candidate order: endpoints first (low wins ties), then roots in
    # bracket order -- matches the reference's strict-improvement scan.
    lams = jnp.concatenate(
        [
            jnp.broadcast_to(ep_low, (B, 1)),
            jnp.broadcast_to(ep_high, (B, 1)),
            lam_r,
        ],
        axis=1,
    )
    liks = jnp.concatenate([ep_liks.T, lik_r], axis=1)
    best = jnp.argmax(liks, axis=1)
    lam_star = jnp.take_along_axis(lams, best[:, None], 1)[:, 0]
    lik_star = jnp.take_along_axis(liks, best[:, None], 1)[:, 0]
    return lam_star, lik_star
