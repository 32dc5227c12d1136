"""Host-driven spectral divide-and-conquer eigendecomposition on device.

Why this exists: XLA's built-in ``jnp.linalg.eigh`` traces its whole
QDWH divide-and-conquer into ONE graph; on this TPU backend the remote
compiler handles it up to n = 8,192 and crashes beyond (measured: 8,192
compiles + runs in ~5 s, 12,288 fails with a compile-helper error).  The
reference outsources exactly these large symmetric eigenproblems to SLATE
distributed linear algebra (reference experiments/large_gwas/
run_pygemma.sh:10,28); the TPU-native answer here keeps the O(n^3) work on
the MXU by driving the divide-and-conquer FROM THE HOST:

1.  sign(A - sigma I) via a GEMM-only matrix-sign iteration (a
    Polar-Express-style degree-5 Newton-Schulz schedule -- nothing but
    n x n matmuls, which compile at any size);
2.  spectral projectors P_lo/P_hi -> invariant-subspace bases via
    randomized range finding + CholeskyQR2 (factorizations only at the
    SUBSPACE size <= 8,192);
3.  Rayleigh-Ritz blocks V' A V solved by ``jnp.linalg.eigh`` at
    <= 8,192 (bucketed padding bounds the number of distinct compiles);
4.  recurse on any block still larger than the cap; back-transform
    eigenvectors with one GEMM per block.

Every device call in the recursion is an independent small jit, so no
single XLA graph ever exceeds what the compile service can digest.  The
split is value-based with the rank read off trace(P); imbalanced splits
simply recurse deeper, so no exact median search is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

#: largest n the backend's built-in eigh is known to compile (measured)
DIRECT_EIGH_MAX = 8192

#: pad Rayleigh-Ritz blocks up to multiples of this to bound compile count
_BUCKET = 1024

#: GEMM-only sign-iteration schedule: (a, b, c) applies X <- aX + bX^3 + cX^5.
#: The two leading Newton-Schulz rows are globally safe for any |x| <=
#: sqrt(3) and land the spectrum inside [0, 1] even when the norm estimate
#: undershot (power iteration converges slowly on clustered top
#: eigenvalues); the quintic rows would DIVERGE for |x| > ~1.01.  The steep
#: quintic rows then pull tiny values toward 1 fast (Polar-Express-style
#: coefficients); the tail rows are Newton-Schulz polish.
_SIGN_SCHEDULE = (
    (1.5, -0.5, 0.0),
    (1.5, -0.5, 0.0),
    (8.28721201814563, -23.595886519098837, 17.300387312530933),
    (4.107059111542203, -2.9478499167379106, 0.5448431082926601),
    (3.9486908534822946, -2.908902115962949, 0.5518191394370137),
    (3.3184196573706015, -2.488488024314874, 0.51004894012372),
    (2.300652019954817, -1.6689039845747493, 0.4188073119525673),
    (1.891301407787398, -1.2679958271945868, 0.37680408948524835),
    (1.8750014808534479, -1.2500016453999487, 0.3750001645474248),
    (1.875, -1.25, 0.375),
    (1.5, -0.5, 0.0),
    (1.5, -0.5, 0.0),
    (1.5, -0.5, 0.0),
)


@partial(jax.jit, static_argnames=())
def _shift_scale(A, sigma, key, boost):
    """H = A - sigma I scaled so its spectrum sits safely inside [-1, 1].

    The scale is a power-iteration estimate of ||H||_2 (a block of 8
    vectors, 24 sweeps -- tight to ~1e-3 for symmetric H) times a 1.05
    safety margin: the quintic sign steps DIVERGE for |x| > ~1.01, and the
    sqrt(n) slack of a Frobenius bound would instead start the iteration so
    deep in [0, eps] that it stalls."""
    n = A.shape[0]
    H = A - sigma * jnp.eye(n, dtype=A.dtype)

    V = jax.random.normal(key, (n, 8), dtype=A.dtype)

    def sweep(V, _):
        V = jnp.dot(H, V, precision=_HI)
        V = V / (jnp.linalg.norm(V, axis=0, keepdims=True)
                 + jnp.finfo(A.dtype).tiny)
        return V, None

    V, _ = jax.lax.scan(sweep, V, None, length=24)
    HV = jnp.dot(H, V, precision=_HI)
    est = jnp.max(jnp.linalg.norm(HV, axis=0))
    alpha = 1.05 * boost * est + jnp.finfo(A.dtype).tiny
    return H / alpha


#: sign iterations MUST run at HIGHEST: with the 3-pass bf16 split (HIGH)
#: the scaled spectrum overshoots the quintic steps' |x| <= ~1.01 safety
#: region by rounding alone, the iterate blows up to NaN, and the boost-
#: retry loop reruns the whole schedule at 4x the scale -- measured 4.4x
#: SLOWER end-to-end (343.9 s vs 77.3 s for the same 16,384 split) than
#: just paying the 6-pass GEMMs
_SIGN_PREC = jax.lax.Precision.HIGHEST


@jax.jit
def _sign_step(X, a, b, c):
    """One quintic sign step PLUS the convergence residual of the INPUT,
    read off the X^2 that the step computes anyway -- so monitoring
    convergence costs zero extra GEMMs (a separate residual check was one
    full n^3 GEMM per polish round)."""
    X2 = jnp.dot(X, X, precision=_SIGN_PREC)
    X3 = jnp.dot(X, X2, precision=_SIGN_PREC)
    X5 = jnp.dot(X3, X2, precision=_SIGN_PREC)
    resid_in = jnp.max(jnp.abs(X2 - jnp.eye(X.shape[0], dtype=X.dtype)))
    return a * X + b * X3 + c * X5, resid_in


@jax.jit
def _sign_step_ns(X, a, b):
    """Cubic (Newton-Schulz) step in TWO GEMMs via Horner:
    aX + bX^3 = X (aI + b X^2).  The generic quintic step spends three
    full-size GEMMs; the schedule's leading/tail NS rows and every polish
    round only need the cubic, so this saves one n^3 HIGHEST GEMM each."""
    n = X.shape[0]
    X2 = jnp.dot(X, X, precision=_SIGN_PREC)
    resid_in = jnp.max(jnp.abs(X2 - jnp.eye(n, dtype=X.dtype)))
    Z = a * jnp.eye(n, dtype=X.dtype) + b * X2
    return jnp.dot(X, Z, precision=_SIGN_PREC), resid_in


@jax.jit
def _sign_residual(X):
    """||X^2 - I||_inf-ish convergence measure (one GEMM + reduction)."""
    X2 = jnp.dot(X, X, precision=_SIGN_PREC)
    return jnp.max(jnp.abs(X2 - jnp.eye(X.shape[0], dtype=X.dtype)))


@jax.jit
def _ritz_sketch(A, Om):
    """(Om'A Om, Om'Om) pencil blocks for a host-side generalized Ritz
    estimate of the spectrum (two GEMMs, no device factorization)."""
    Y = jnp.dot(A, Om, precision=_HI)
    return jnp.dot(Om.T, Y, precision=_HI), jnp.dot(Om.T, Om, precision=_HI)


def _spectral_quantile(A, q, seed, k: int = 512):
    """Estimate a split point near the q-quantile of A's spectrum from the
    Ritz values of a random k-dim subspace (generalized eigenproblem
    solved on host at k^2).

    The diagonal of a correlation-like matrix is nearly constant and says
    nothing about the spectral BULK, so a diagonal-median split lands far
    from the half-rank point and forces an extra recursion level; bulk
    Ritz quantiles track the true spectral quantiles well.

    GAP PREFERENCE: when a pronounced spectral gap exists near the target
    quantile, sigma is placed at ITS midpoint instead of the raw quantile.
    A sigma INSIDE a (near-)degenerate cluster stalls the sign iteration
    on the whole cluster (eigenvalues AT sigma have no sign), and the
    resulting pseudo-projector can mix one cluster direction into the
    wrong Rayleigh block -- observed as a single eigenvalue off ~100x on
    K = GG'/p + eps I with n > p, whose eps eigenvalue is (n - p)-fold
    degenerate and spans the median.  Continuous bulks (MP-law Grams)
    have no dominant gap and keep the plain quantile."""
    import scipy.linalg

    n = A.shape[0]
    k = min(k, n)
    # device-side Gaussians: a host-generated block would ship n*k floats
    # through the tunnel (~35 MB here, but 600+ MB in _orthonormal_range --
    # measured 47 s of a 131 s eigh before the switch)
    Om = jax.random.normal(jax.random.PRNGKey(seed & 0x7FFFFFFF), (n, k),
                           dtype=jnp.float32)
    H, B = _ritz_sketch(A, Om)
    Hh = np.asarray(H, np.float64)
    Bh = np.asarray(B, np.float64)
    Hh = (Hh + Hh.T) / 2
    Bh = (Bh + Bh.T) / 2 + 1e-6 * np.trace(Bh) / k * np.eye(k)
    try:
        ritz = scipy.linalg.eigh(Hh, Bh, eigvals_only=True)
    except Exception:
        return None
    target = float(np.quantile(ritz, q))
    # DEGENERACY SNAP: if the target sits inside a tie cluster of Ritz
    # values (a (near-)degenerate eigenvalue, e.g. the (n-p)-fold eps of
    # K = GG'/p + eps I), move sigma to the midpoint of the larger
    # adjacent gap -- a sigma AT the degenerate value stalls the sign
    # iteration on the whole cluster and the pseudo-projector can mix one
    # cluster direction into the wrong Rayleigh block (observed: one
    # eigenvalue off ~100x).  Continuous bulks never form such ties.
    spread = float(ritz[-1] - ritz[0]) + 1e-300
    tol = 1e-4 * spread
    lo = int(np.searchsorted(ritz, target - tol, side="left"))
    hi = int(np.searchsorted(ritz, target + tol, side="right"))
    if hi - lo > max(3, int(0.02 * k)):
        below = float(ritz[lo] - ritz[lo - 1]) if lo > 0 else -np.inf
        above = float(ritz[hi] - ritz[hi - 1]) if hi < k else -np.inf
        if above >= below and np.isfinite(above):
            return float(0.5 * (ritz[hi - 1] + ritz[hi]))
        if np.isfinite(below):
            return float(0.5 * (ritz[lo - 1] + ritz[lo]))
        # the tie spans the whole sketch: a (near-)multiple of identity;
        # the caller's forced half-split handles it exactly
    return target


@jax.jit
def _projector_rank(S):
    """P_lo = (I - sign)/2; returns (P_lo, trace estimate of its rank)."""
    n = S.shape[0]
    P = 0.5 * (jnp.eye(n, dtype=S.dtype) - S)
    return P, jnp.trace(P)


@jax.jit
def _project_out(V, Y):
    return Y - jnp.dot(V, jnp.dot(V.T, Y, precision=_HI), precision=_HI)


@jax.jit
def _qr_q(Y):
    """Householder-QR orthonormalization: always returns exactly
    orthonormal columns, even for rank-deficient Y (deficient directions
    become arbitrary orthonormal completions -- harmless inside a
    (near-)degenerate eigenspace, and the coupling check catches the
    harmful case)."""
    Q, _ = jnp.linalg.qr(Y)
    return Q


#: width above which a Householder QR is replaced by the panel-blocked BCGS2
#: (measured on the tunneled v5e: qr at (16384, 8192) stalls the remote
#: compiler, and triangular_solve with an 8192 factor x 16384 RHS OOMs with
#: ~16 GB of unrolled temps; panels of 2048 keep both well inside limits)
_PANEL_QR_MAX_DIRECT = 4096
_PANEL = 2048


@jax.jit
def _cholqr2(Y):
    """CholeskyQR2: two CholeskyQR passes give machine-orthonormal columns
    for moderately conditioned Y -- and run as pure GEMM + (k, k) Cholesky
    + small-factor triangular solve, all MXU/compile-friendly sizes.

    This replaces the tall Householder QR on the panel path: XLA's
    Householder at (16384, 2048) is the measured wall of the range-finding
    stage (it is not MXU-dense), while both CholQR passes together are a
    few hundred ms of GEMMs.  Rank-deficient input yields NaN columns
    (cholesky of a singular Gram); callers check and fall back."""
    for _ in range(2):
        G = jnp.dot(Y.T, Y, precision=_HI)
        eps = jnp.finfo(Y.dtype).eps
        G = G + (eps * jnp.trace(G)) * jnp.eye(G.shape[0], dtype=Y.dtype)
        L = jnp.linalg.cholesky(G)  # G = L L'
        Y = jax.scipy.linalg.solve_triangular(
            L, Y.T, lower=True).T  # Y <- Y L^-T
    return Y


@partial(jax.jit, static_argnames=())
def _panel_step_cqr(Qbuf, Yj, j):
    """BCGS2 panel step with CholeskyQR2 panel factorization (see
    :func:`_cholqr2`; the Householder variant below is the fallback for
    rank-deficient panels)."""
    for _ in range(2):
        Yj = Yj - jnp.dot(Qbuf, jnp.dot(Qbuf.T, Yj, precision=_HI),
                          precision=_HI)
    Qj = _cholqr2(Yj)
    return jax.lax.dynamic_update_slice(Qbuf, Qj, (0, j))


@partial(jax.jit, static_argnames=())
def _panel_step(Qbuf, Yj, j):
    """One panel of blocked BCGS2: project the (n, panel) slab Yj against
    the already-filled columns of Qbuf (zeros beyond the fill line
    contribute nothing) with two Gram-Schmidt sweeps, orthonormalize the
    slab with a single Householder QR at the panel width, and write it at
    column j.

    All shapes are fixed, so the whole loop reuses ONE executable with a
    traced start index."""
    # two Gram-Schmidt sweeps against previous panels (BCGS2: the second
    # sweep restores orthogonality lost to f32 roundoff in the first)
    for _ in range(2):
        Yj = Yj - jnp.dot(Qbuf, jnp.dot(Qbuf.T, Yj, precision=_HI),
                          precision=_HI)
    # Householder QR at the PANEL width (tall-narrow compiles fine on this
    # backend; only the wide k x k factorizations do not) -- machine-
    # orthonormal panels keep the whole basis at ~eps * sqrt(#panels)
    Qj, _ = jnp.linalg.qr(Yj)
    return jax.lax.dynamic_update_slice(Qbuf, Qj, (0, j))


def _panel_qr(Y, panel: int = _PANEL, cholqr: bool = True):
    """Orthonormalize the columns of a tall (n, k) block with GEMMs plus
    per-panel factorizations (blocked BCGS2) -- the sizes this backend's
    compiler and HBM handle.  Columns are processed in fixed-shape slabs so
    the device loop compiles once.  ``cholqr=True`` uses the CholeskyQR2
    panel (GEMM-dominated, ~10x faster than the Householder panel on this
    backend); False is the rank-robust Householder fallback."""
    n, k = Y.shape
    pad = (-k) % panel
    if pad:
        # random pad columns orthonormalize into harmless extra directions
        # (device-side: no tunnel traffic)
        Y = jnp.concatenate(
            [Y, jax.random.normal(jax.random.PRNGKey(k), (n, pad),
                                  dtype=Y.dtype)],
            axis=1)
    Qbuf = jnp.zeros_like(Y)
    step = _panel_step_cqr if cholqr else _panel_step
    for j in range(0, k + pad, panel):
        Yj = jax.lax.dynamic_slice(Y, (0, j), (n, panel))
        Qbuf = step(Qbuf, Yj, j)
    return Qbuf[:, :k] if pad else Qbuf


def _ortho_cols(Y):
    """Orthonormalization dispatch.

    Fast path: CholeskyQR2 (whole-block when narrow, BCGS2 panels when
    wide).  A rank-deficient block makes CholQR emit NaN columns; the ONE
    host check per call catches that and reruns through the Householder
    path, which completes deficient directions with arbitrary orthonormal
    ones (harmless inside a (near-)degenerate eigenspace -- the coupling
    gate downstream catches the harmful case)."""
    k = Y.shape[1]
    Q = _cholqr2(Y) if k <= _PANEL else _panel_qr(Y, cholqr=True)
    if bool(jnp.isfinite(jnp.sum(Q[0]) + jnp.sum(Q[-1]))):
        return Q
    return _qr_q(Y) if k <= _PANEL_QR_MAX_DIRECT else _panel_qr(
        Y, cholqr=False)


def _orthonormal_range(P, k, seed, refine: int = 1):
    """Orthonormal (n, k) basis of the rank-k range of projector P via
    randomized range finding (subspace iteration sharpens the basis; one
    refine pass suffices for a converged sign projector).  The Gaussian
    block is generated ON DEVICE: shipping a host-generated (n, k) block
    costs n*k*4 bytes of tunnel traffic (638 MB at n=16,384, k=9,748 --
    measured as the dominant term of the whole eigh before the switch)."""
    n = P.shape[0]
    Om = jax.random.normal(jax.random.PRNGKey(seed & 0x7FFFFFFF), (n, k),
                           dtype=jnp.float32)
    Q = _ortho_cols(jnp.dot(P, Om, precision=_HI))
    for _ in range(refine):
        Q = _ortho_cols(jnp.dot(P, Q, precision=_HI))
    return Q


@partial(jax.jit, static_argnames=("m",))
def _pad_block(B, m: int):
    """Embed (r, r) B block-diagonally in an (m, m) bucket padded with mu I
    (mu > max |eigenvalue|), so B's pairs come out first in the ascending
    order and the pad block stays exactly separate.  Kept OUTSIDE the eigh
    executable on purpose: the eigh compile is the expensive/fragile one on
    the remote compile service, so it must stay a canonical plain-eigh HLO
    that caches identically across callers."""
    r = B.shape[0]
    mu = 2.0 * jnp.max(jnp.abs(B)) * r + 1.0
    Apad = jnp.zeros((m, m), B.dtype)
    Apad = Apad.at[:r, :r].set(B)
    Apad = Apad.at[jnp.arange(r, m), jnp.arange(r, m)].set(mu)
    return Apad


@jax.jit
def _eigh_plain(A):
    return jnp.linalg.eigh(A)


def _eigh_padded(B, m: int):
    A = B if m == B.shape[0] else _pad_block(B, m)
    # the remote compile helper is occasionally killed under memory
    # pressure (observed SIGKILL on a compile that succeeds on retry);
    # a cold big-eigh compile is ~minutes, so a bounded retry is worth it
    last = None
    for attempt in range(3):
        try:
            ev, U = _eigh_plain(A)
            # surface async execution failures INSIDE the try so they are
            # retried too, not raised later at first use outside it
            ev.block_until_ready()
            return ev, U
        except Exception as e:
            last = e
            # any JaxRuntimeError (compile-service 500s, transport resets,
            # OOM-killed helpers) is worth retrying; other exception types
            # retry only on the known transient markers
            transient = isinstance(e, jax.errors.JaxRuntimeError) or any(
                s in str(e) for s in ("remote_compile", "SIGKILL")
            )
            if not transient:
                raise
            import time as _time

            _time.sleep(5.0 * (attempt + 1))
    raise RuntimeError(f"eigh compile failed after retries: {last}")


@jax.jit
def _back_transform(V, Usub):
    return jnp.dot(V, Usub, precision=_HI)


@jax.jit
def _pair_residuals(A, U, ev):
    """Per-eigenpair residual norms ||A u_i - ev_i u_i||_2 and Rayleigh
    quotients, from ONE full GEMM.

    The residual matrix is materialized and normed directly: the
    algebraically equivalent ||AU||^2 - 2 ev d + ev^2 cancels
    catastrophically in f32 (measured: s ~ 1e-2 noise on an EXACT
    eigenbasis of 3.5*I, falsely triggering the repair)."""
    AU = jnp.dot(A, U, precision=_HI)
    d = jnp.sum(U * AU, axis=0)
    R = AU - U * ev[None, :]
    return jnp.sqrt(jnp.sum(R * R, axis=0)), d, AU


def _residual_repair(A, ev, U, verbose=False, tol_rel=2e-3, max_bad=512,
                     rounds: int = 8):
    prev = np.inf
    for r in range(rounds):
        ev, U, fixed, s_max = _residual_repair_once(
            A, ev, U, verbose, tol_rel, max_bad)
        if fixed:
            return ev, U
        if verbose:
            print(f"[eigh_dc] residual repair round {r}: "
                  f"max resid {s_max:.2e}", flush=True)
        if s_max > prev / 1.3:
            # a round that does not contract means the defect's partner
            # mass exceeds the repair span (or it is not a mixture at
            # all); further identical rounds are pure waste
            if verbose:
                print("[eigh_dc] residual repair stalled -- keeping the "
                      "best-effort basis", flush=True)
            return ev, U
        prev = s_max
    return ev, U


def _residual_repair_once(A, ev, U, verbose=False, tol_rel=2e-3,
                          max_bad=512):
    """Validate every eigenpair and repair mixed directions.

    The D&C can very occasionally assign a direction that mixes two true
    eigenspaces while every split-level coupling check stays clean (the
    mixture's pieces live inside ONE side's span -- observed on a matrix
    with an (n-p)-fold degenerate eigenvalue crossing the split quantile:
    one eigenvalue off ~100x).  Mixtures are invisible to coupling but
    LOUD in the per-pair residual ||A u - ev u||; and they come in closed
    sets, so re-diagonalizing the Rayleigh block of the flagged columns
    repairs them exactly within their joint span.  Cost: one n^3 GEMM for
    the residual sweep (the certificate every call now carries) plus a
    tiny eigh when something is actually wrong."""
    s, d, AU = _pair_residuals(A, U, ev)
    scale = float(jnp.max(jnp.abs(ev))) + 1e-30
    s_np = np.asarray(s)
    s_max = float(s_np.max())
    if s_max <= tol_rel * scale:
        return ev, U, True, s_max
    # flag the clearly-elevated residuals (a genuine mixture stands well
    # above the f32 bulk noise shoulder), then pull in each flagged
    # column's strongest COUPLING PARTNERS: the mixture's other pieces sit
    # in columns j with large |(U' A u_bad)_j|, which one (n, k) GEMM
    # against the AU we already have reads off directly.  The joint span
    # contains the true eigenvectors, so one small Rayleigh eigh repairs
    # them exactly.
    flag = np.where(s_np > max(tol_rel * scale, 0.4 * s_max))[0]
    flag = flag[np.argsort(-s_np[flag])][:max_bad // 8]
    # coupling coordinates of each flagged residual over the basis: the
    # residual r_i = A u_i - ev_i u_i lies entirely in span(U), with
    # coefficient c_j = (U' A u_i)_j on column j (j != i).  Select
    # partners until they COVER >= 99.5% of each residual's mass -- a
    # fixed top-k misses diffuse mixtures (a direction smeared over a
    # degenerate cluster needs hundreds of partner columns) and then the
    # in-span re-diagonalization only shaves the defect by ~2x per round.
    C = np.array(jnp.dot(U.T, AU[:, jnp.asarray(flag)], precision=_HI))
    C[flag, np.arange(len(flag))] = 0.0  # self rows carry ev, not coupling
    C2 = C * C
    # few flagged columns can afford a wide span: the repair block is one
    # bucketed leaf eigh, so up to 2048 partners stay cheap, and a defect
    # smeared across a continuous bulk genuinely needs that many
    cap = max_bad if len(flag) > 4 else 2048
    sel = set(flag.tolist())
    for i in range(len(flag)):
        order_i = np.argsort(-C2[:, i])
        cum = np.cumsum(C2[order_i, i])
        total = cum[-1] + 1e-300
        k_need = int(np.searchsorted(cum, 0.995 * total)) + 1
        sel.update(order_i[:k_need].tolist())
        if len(sel) >= cap:
            break
    sel = np.sort(np.fromiter(sel, dtype=np.int64))[:cap]
    cov = float(C2[sel, :].sum() / (C2.sum() + 1e-300))
    if cov < 0.5:
        # the residual mass is spread (near-)uniformly over the basis --
        # not a block mixture an in-span re-diagonalization can fix (a
        # 2048-wide span was measured to cover 9% on a continuous-bulk
        # Gram); repairing would burn GEMMs for nothing
        if verbose:
            print(f"[eigh_dc] repair span {len(sel)} covers only "
                  f"{cov:.3f} of the residual mass -- not a repairable "
                  f"mixture (max resid {s_max:.2e})", flush=True)
        return ev, U, True, s_max
    if verbose:
        print(f"[eigh_dc] repair span {len(sel)} covers {cov:.3f} of the "
              f"flagged residual mass", flush=True)
    idx = jnp.asarray(np.sort(sel))
    Wb = U[:, idx]
    B = jnp.dot(Wb.T, AU[:, idx], precision=_HI)
    B = 0.5 * (B + B.T)
    eb, Q = _eigh_small(B)
    U = U.at[:, idx].set(jnp.dot(Wb, Q, precision=_HI))
    ev = ev.at[idx].set(eb)
    if verbose:
        print(f"[eigh_dc] residual sweep: repaired {len(flag)} mixed "
              f"direction(s) in a {len(sel)}-dim span "
              f"(max resid {s_max:.2e})", flush=True)
    order = jnp.argsort(ev)
    return ev[order], U[:, order], False, s_max


def _eigh_small(A) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r = A.shape[0]
    if r <= DIRECT_EIGH_MAX:
        # bounded bucket set: a cold compile of the built-in eigh costs
        # ~minutes on the remote compile service (8,192 measured at 311 s,
        # then ~1 s warm from the persistent cache), so the set of distinct
        # executables stays small -- but eigh cost is CUBIC in the bucket,
        # so above 4,096 the granularity is 1,024 steps
        # ({5120, 6144, 7168, 8192}): a 4,800 half in the old 6,144 bucket
        # paid 2.1x its flops, and both mid leaves of the bench's 16,384
        # Gram land in the same 5,120 bucket (one compile, ~4 s saved warm)
        if r <= 2048:
            m = 1024 if r <= 1024 else 2048
        else:
            m = ((r + 1023) // 1024) * 1024
            if m == 3072:
                m = 4096  # keep the legacy small-bucket set sparse
        m = min(m, DIRECT_EIGH_MAX)
    else:
        m = r
    ev, U = _eigh_padded(A, m)
    return ev[:r], U[:r, :r]


def eigh_dc(
    A,
    max_block: int = DIRECT_EIGH_MAX,
    seed: int = 0,
    _depth: int = 0,
    _scale0: float = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full symmetric eigendecomposition (ascending), any size, on device.

    ``max_block``: largest subproblem handed to the built-in eigh.
    ``_scale0``: the ROOT matrix magnitude, threaded through the recursion
    -- the coupling gate measures against it, because the f32 noise floor
    of the split is set by the original matrix, not the (smaller) deep
    blocks: a depth-1 gate relative to the local scale retried twice per
    call on couplings that were already at the root-relative target
    (measured: 2x ~2 s of wasted warm range finds per level).
    Returns device arrays (ev (n,), U (n, n)).
    """
    import os
    import time as _t

    verbose = os.environ.get("PYGEMMA_TPU_DC_VERBOSE", "") == "1"
    t_start = _t.time()
    A = jnp.asarray(A)
    n = A.shape[0]
    if n <= max_block:
        out = _eigh_small(A)
        if verbose:
            out[0].block_until_ready()
            print(f"[eigh_dc] leaf n={n} {_t.time()-t_start:.1f}s",
                  flush=True)
        return out
    if _depth > 8:
        raise RuntimeError("eigh_dc: spectral split failed to reduce size")

    # --- split point: Ritz-sketch estimate of a spectral quantile (the
    # diagonal is a poor stand-in on correlation-like matrices), nudged by
    # the realized rank on retries.  Balanced splits minimize depth; when
    # the block is barely over the leaf cap, shave a thin slice off the
    # spectrum's bottom instead (low density at the edge -> the sign
    # iteration converges fast, and the big side lands exactly at the cap).
    diag = np.asarray(jnp.diagonal(A))
    if n <= int(1.3 * max_block):
        # floor the shave at ~2/k of the 512-point Ritz sample: a thinner
        # target than the quantile resolution lands sigma at/below
        # lambda_min (r_lo = 0) and the retry loop degenerates into the
        # exact half-split coupling failure.  Over-shaving is harmless: the
        # big side just lands below the leaf cap.
        frac_target = max((n - max_block) / n, 2.0 / 512.0)
    else:
        frac_target = 0.5
    sigma = _spectral_quantile(A, frac_target, seed=seed * 31 + _depth)
    if sigma is None or not np.isfinite(sigma):
        sigma = float(np.quantile(diag, frac_target))
    min_side = max(32, int(0.4 * min(frac_target, 1 - frac_target) * n))
    r_lo = 0
    for attempt in range(4):
        t_att = _t.time()
        key = jax.random.PRNGKey(seed * 1009 + 17 * _depth + attempt)
        # boost retry: a clustered spectrum can make the power-iteration
        # norm undershoot enough that the Newton-Schulz safety region
        # (|x| < sqrt(3)) is breached and the iteration blows up to NaN;
        # rescaling 4x and rerunning is cheap and always lands inside
        boost = 1.0
        for _ in range(4):
            S = _shift_scale(A, jnp.float32(sigma), key, jnp.float32(boost))
            # fused-residual schedule: each step also returns the residual
            # of its INPUT for free (read off the X^2 it computes anyway).
            # In the Newton-Schulz tail a converged input means the
            # remaining tail rows are no-ops up to roundoff -- skip them
            # (each skipped row is 3 full-size HIGHEST GEMMs).
            n_sched = 0
            for irow, (a, b, c) in enumerate(_SIGN_SCHEDULE):
                if c == 0.0:  # cubic row: 2 GEMMs instead of 3
                    S, r_in = _sign_step_ns(S, jnp.float32(a),
                                            jnp.float32(b))
                else:
                    S, r_in = _sign_step(S, jnp.float32(a), jnp.float32(b),
                                         jnp.float32(c))
                n_sched += 1
                # start checking once the aggressive quintic block is done
                # (row 7): each skipped row is 3 full-size HIGHEST GEMMs,
                # each check one ~34 ms scalar pull
                if irow >= 7 and irow < len(_SIGN_SCHEDULE) - 1:
                    r_h = float(r_in)
                    if not np.isfinite(r_h) or r_h < 1.5e-2:
                        break
            # polish until converged (an eigenvalue close to sigma -- or a
            # boosted scale -- slows the contraction).  A degenerate block
            # (everything == sigma) never converges; its pseudo-projector
            # still splits the space, which is exact for an eigenspace.
            # STALL DETECTION matters: with sigma inside a dense spectral
            # bulk the unconverged mass is eigenvalues within ~1e-4 of
            # sigma, which extra Newton-Schulz rounds cannot fix at a
            # useful rate -- their leakage is tiny and the coupling check
            # downstream guards correctness.  Rounds that stop improving
            # the residual by >=1.5x are wasted 16,384-sized GEMMs
            # (measured round 4: a stall-blind 10-round polish was a major
            # part of a 753 s depth-0 sign that needs ~16 s).  The fused
            # residual makes each round ONE 3-GEMM step instead of
            # 3 steps + a residual GEMM.
            n_polish = 0
            prev_resid = np.inf
            for _ in range(10):
                S_new, r_in = _sign_step_ns(S, jnp.float32(1.5),
                                            jnp.float32(-0.5))
                resid = float(r_in)  # residual of S BEFORE this NS step
                if not np.isfinite(resid):
                    S = S_new
                    break
                if resid < 3e-2:
                    # input already converged; one extra NS only sharpens
                    S = S_new
                    break
                if resid > prev_resid / 1.5:
                    S = S_new
                    break  # stalled: non-convergent near-sigma modes
                prev_resid = resid
                n_polish += 1
                S = S_new
            if np.isfinite(float(_sign_residual(S))):
                break
            if verbose:
                print(f"[eigh_dc] n={n} depth={_depth} attempt={attempt} "
                      f"NaN at boost={boost} -> rescale", flush=True)
            boost *= 4.0
        if verbose:
            print(f"[eigh_dc] n={n} depth={_depth} attempt={attempt} "
                  f"sigma={sigma:.4g} boost={boost} sched={n_sched} "
                  f"polish={n_polish} "
                  f"{_t.time()-t_att:.1f}s", flush=True)
        P_lo, tr = _projector_rank(S)
        tr_f = float(tr)
        r_lo = int(np.clip(round(tr_f), 0, n)) if np.isfinite(tr_f) else 0
        if min(r_lo, n - r_lo) >= min_side:
            break
        if frac_target != 0.5 and 0 < r_lo and (n - r_lo) <= max_block:
            break  # edge shave did its job: the big side fits a leaf
        # degenerate split (sigma off-target): nudge toward the other side
        # using Ritz (fallback: diagonal) quantiles
        q = (frac_target * 0.5 if r_lo / n > frac_target
             else frac_target + (1 - frac_target) * 0.5)
        s_new = _spectral_quantile(A, q, seed=seed * 31 + 7 * _depth + attempt)
        sigma = (s_new if s_new is not None and np.isfinite(s_new)
                 else float(np.quantile(diag, q)))
    if verbose:
        print(f"[eigh_dc] n={n} depth={_depth} split r_lo={r_lo} "
              f"sigma={sigma:.4g} sign+{_t.time()-t_start:.1f}s", flush=True)
    if r_lo == 0 or r_lo == n:
        # spectrum would not split by value (near-multiple of identity).
        # Splitting a (near-)degenerate eigenspace by ANY orthogonal
        # decomposition is exact, so force a half split; the recursion
        # bottoms out at the direct eigh either way.
        r_lo = n // 2
        P_lo = 0.5 * jnp.eye(n, dtype=A.dtype)

    del S  # n^2 sign iterate: dead past the projector
    t_sub = _t.time()
    # Range finding with a coupling-gated retry.  V_lo comes from
    # randomized range finding on the projector; V_hi is the orthonormal
    # COMPLEMENT of span(V_lo) (two projection sweeps of a fresh Gaussian
    # block + CholQR2) -- for an exact spectral projector the complement
    # IS range(P_hi), so the P_hi multiplications the old path paid are
    # pure waste, and the coupling gate still validates the split.
    # Rayleigh blocks and the coupling come from ONE stacked pencil
    # M = [V_lo V_hi]' A [V_lo V_hi]: two full-size GEMMs replace the
    # separate coupling GEMM + two Rayleigh products.
    # Retry policy: attempt 0 runs refine=1 (cheap); a failed gate retries
    # once with refine=2 and a fresh seed.  A third identical retry never
    # helped (measured: stalled coupling comes from projector leakage when
    # sigma sits in a dense spectral bulk -- fresh draws cannot fix it,
    # and the leaked mass is small enough for the 2e-2 acceptance below).
    scale = float(jnp.max(jnp.abs(A))) + 1e-30
    if _scale0 is None:
        _scale0 = scale
    gate = max(scale, _scale0)
    coupling = np.inf
    best = None
    for rtry in range(2):
        V_lo = _orthonormal_range(
            P_lo, r_lo, seed=seed * 7919 + 13 + _depth + 1000 * rtry,
            refine=1 + rtry)
        Z = jax.random.normal(
            jax.random.PRNGKey((seed * 7919 + 101 + _depth + 1000 * rtry)
                               & 0x7FFFFFFF),
            (n, n - r_lo), dtype=jnp.float32)
        V_hi = _ortho_cols(_project_out(V_lo, Z))
        del Z
        V_hi = _ortho_cols(_project_out(V_lo, V_hi))
        U_split = jnp.concatenate([V_lo, V_hi], axis=1)
        AV = jnp.dot(A, U_split, precision=_HI)
        M = jnp.dot(U_split.T, AV, precision=_HI)
        del AV, U_split
        coupling = float(jnp.max(jnp.abs(M[r_lo:, :r_lo])))
        # accept below 8e-3*gate without retrying: a fresh-draw retry on a
        # marginal coupling costs a full range find and consistently fails
        # to improve (measured at 16,384: 6.35e-3 -> 5.64e-3 across two
        # draws -- the leakage is the projector's, not the draw's), while
        # final eigenvector residuals stay at the f32 floor (8.6e-5
        # relative) well below the test gates
        if np.isfinite(coupling) and coupling <= 8e-3 * gate:
            best = (coupling, M, V_lo, V_hi)
            break
        if best is None or (np.isfinite(coupling)
                            and coupling < best[0]):
            best = (coupling, M, V_lo, V_hi)
        # drop the local references NOW: holding a non-best candidate's
        # full-size pencil + bases across the next attempt (or into the
        # recursion, via the leaked `best` alias) OOMs the leaf eigh,
        # whose scratch alone is ~30 * 8192^2 floats
        del M, V_lo, V_hi
        if verbose:
            print(f"[eigh_dc] n={n} depth={_depth} retry range "
                  f"(coupling {coupling:.2e})", flush=True)
    coupling, M, V_lo, V_hi = best
    del best
    del P_lo
    if not np.isfinite(coupling) or coupling > 2e-2 * gate:
        raise RuntimeError(
            f"eigh_dc: subspace split left coupling {coupling:.2e} "
            f"(scale {scale:.2e}); falling back to a dense eigh is required")
    if verbose:
        print(f"[eigh_dc] n={n} depth={_depth} ranges+pencil+coupling "
              f"{coupling:.2e} {_t.time()-t_sub:.1f}s", flush=True)
    # symmetrized diagonal blocks of the pencil are the Rayleigh blocks
    A_lo = 0.5 * (M[:r_lo, :r_lo] + M[:r_lo, :r_lo].T)
    A_hi = 0.5 * (M[r_lo:, r_lo:] + M[r_lo:, r_lo:].T)
    # every n^2 buffer that is dead across the recursion must be freed NOW:
    # recursion frames stack, and the leaf's built-in eigh alone needs
    # ~30 m^2 floats of HBM scratch (OOM observed at n=16,384 without this)
    del M
    ev_lo, U_lo = eigh_dc(A_lo, max_block, seed + 1, _depth + 1, _scale0)
    del A_lo
    # back-transform the low block BEFORE recursing on the high one: V_lo
    # and U_lo together hold ~n*r_lo + r_lo^2 floats that the second
    # recursion's leaf eigh (scratch ~30 * 8192^2 floats) does not need
    B_lo = _back_transform(V_lo, U_lo)
    del V_lo, U_lo
    ev_hi, U_hi = eigh_dc(A_hi, max_block, seed + 2, _depth + 1, _scale0)
    del A_hi
    B_hi = _back_transform(V_hi, U_hi)
    del V_hi, U_hi
    U = jnp.concatenate([B_lo, B_hi], axis=1)
    del B_lo, B_hi
    ev = jnp.concatenate([ev_lo, ev_hi])
    # ascending across the two blocks (value split guarantees order up to
    # projector leakage; a final argsort makes it exact)
    order = jnp.argsort(ev)
    ev, U = ev[order], U[:, order]
    if _depth == 0:
        # one-GEMM certificate + local repair of any mixed direction
        ev, U = _residual_repair(A, ev, U, verbose)
    if verbose:
        print(f"[eigh_dc] n={n} depth={_depth} done {_t.time()-t_start:.1f}s",
              flush=True)
    return ev, U
