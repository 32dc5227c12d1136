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


@jax.jit
def _sign_step(X, a, b, c):
    X2 = jnp.dot(X, X, precision=_HI)
    X3 = jnp.dot(X, X2, precision=_HI)
    X5 = jnp.dot(X3, X2, precision=_HI)
    return a * X + b * X3 + c * X5


@jax.jit
def _sign_residual(X):
    """||X^2 - I||_inf-ish convergence measure (one GEMM + reduction)."""
    X2 = jnp.dot(X, X, precision=_HI)
    return jnp.max(jnp.abs(X2 - jnp.eye(X.shape[0], dtype=X.dtype)))


@jax.jit
def _projector_rank(S):
    """P_lo = (I - sign)/2; returns (P_lo, trace estimate of its rank)."""
    n = S.shape[0]
    P = 0.5 * (jnp.eye(n, dtype=S.dtype) - S)
    return P, jnp.trace(P)


@jax.jit
def _range_gram(P, Om):
    Y = jnp.dot(P, Om, precision=_HI)
    return Y, jnp.dot(Y.T, Y, precision=_HI)


@jax.jit
def _gram(Y):
    return jnp.dot(Y.T, Y, precision=_HI)


@jax.jit
def _project_out(V, Y):
    return Y - jnp.dot(V, jnp.dot(V.T, Y, precision=_HI), precision=_HI)


@jax.jit
def _cholqr_solve(Y, G):
    """One CholeskyQR pass: Q = Y R^{-1} with R = chol(G), G = Y'Y.

    Fallback orthonormalization for backends where a tall Householder QR
    at the full size does not compile: only the (k, k) Gram is factorized.
    NOTE: masks rank deficiency (the ridge keeps chol finite), so callers
    must tolerate or check column norms."""
    eps = jnp.finfo(Y.dtype).eps
    G = G + (eps * jnp.trace(G)) * jnp.eye(G.shape[0], dtype=Y.dtype)
    R = jnp.linalg.cholesky(G.T).T  # upper-triangular factor G = R'R
    Qt = jax.scipy.linalg.solve_triangular(R.T, Y.T, lower=True)
    return Qt.T


@jax.jit
def _qr_q(Y):
    """Householder-QR orthonormalization: always returns exactly
    orthonormal columns, even for rank-deficient Y (deficient directions
    become arbitrary orthonormal completions -- harmless inside a
    (near-)degenerate eigenspace, and the coupling check catches the
    harmful case)."""
    Q, _ = jnp.linalg.qr(Y)
    return Q


def _orthonormal_range(P, k, seed, refine: int = 1):
    """Orthonormal (n, k) basis of the rank-k range of projector P via
    randomized range finding + Householder QR (subspace iteration sharpens
    the basis; one refine pass suffices for a converged sign projector)."""
    n = P.shape[0]
    rng = np.random.default_rng(seed)
    Om = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    Q = _qr_q(jnp.dot(P, Om, precision=_HI))
    for _ in range(refine):
        Q = _qr_q(jnp.dot(P, Q, precision=_HI))
    return Q


@jax.jit
def _rayleigh_block(A, V):
    AV = jnp.dot(A, V, precision=_HI)
    return jnp.dot(V.T, AV, precision=_HI)


@partial(jax.jit, static_argnames=("m",))
def _eigh_padded(B, m: int):
    """eigh of (r, r) B embedded in an (m, m) bucket: pad block-diagonally
    with mu I (mu > max |eigenvalue|), so B's pairs come out first in the
    ascending order and the pad block stays exactly separate."""
    r = B.shape[0]
    if m == r:
        return jnp.linalg.eigh(B)
    mu = 2.0 * jnp.max(jnp.abs(B)) * r + 1.0
    Apad = jnp.zeros((m, m), B.dtype)
    Apad = Apad.at[:r, :r].set(B)
    Apad = Apad.at[jnp.arange(r, m), jnp.arange(r, m)].set(mu)
    ev, U = jnp.linalg.eigh(Apad)
    return ev, U


@jax.jit
def _back_transform(V, Usub):
    return jnp.dot(V, Usub, precision=_HI)


def _eigh_small(A) -> Tuple[jnp.ndarray, jnp.ndarray]:
    r = A.shape[0]
    m = min(max(_BUCKET, ((r + _BUCKET - 1) // _BUCKET) * _BUCKET),
            DIRECT_EIGH_MAX) if r <= DIRECT_EIGH_MAX else r
    ev, U = _eigh_padded(A, m)
    return ev[:r], U[:r, :r]


def eigh_dc(
    A,
    max_block: int = DIRECT_EIGH_MAX,
    seed: int = 0,
    _depth: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full symmetric eigendecomposition (ascending), any size, on device.

    ``max_block``: largest subproblem handed to the built-in eigh.
    Returns device arrays (ev (n,), U (n, n)).
    """
    A = jnp.asarray(A)
    n = A.shape[0]
    if n <= max_block:
        return _eigh_small(A)
    if _depth > 8:
        raise RuntimeError("eigh_dc: spectral split failed to reduce size")

    # --- split point: median of the Rayleigh diagonal, nudged by rank ----
    diag = np.asarray(jnp.diagonal(A))
    sigma = float(np.median(diag))
    r_lo = 0
    for attempt in range(4):
        key = jax.random.PRNGKey(seed * 1009 + 17 * _depth + attempt)
        # boost retry: a clustered spectrum can make the power-iteration
        # norm undershoot enough that the Newton-Schulz safety region
        # (|x| < sqrt(3)) is breached and the iteration blows up to NaN;
        # rescaling 4x and rerunning is cheap and always lands inside
        boost = 1.0
        for _ in range(4):
            S = _shift_scale(A, jnp.float32(sigma), key, jnp.float32(boost))
            for a, b, c in _SIGN_SCHEDULE:
                S = _sign_step(S, jnp.float32(a), jnp.float32(b),
                               jnp.float32(c))
            # polish until converged (an eigenvalue close to sigma -- or a
            # boosted scale -- slows the contraction).  A degenerate block
            # (everything == sigma) never converges; its pseudo-projector
            # still splits the space, which is exact for an eigenspace.
            for _ in range(10):
                resid = float(_sign_residual(S))
                if not np.isfinite(resid) or resid < 3e-2:
                    break
                for _ in range(3):
                    S = _sign_step(S, jnp.float32(1.5), jnp.float32(-0.5),
                                   jnp.float32(0.0))
            if np.isfinite(float(_sign_residual(S))):
                break
            boost *= 4.0
        P_lo, tr = _projector_rank(S)
        tr_f = float(tr)
        r_lo = int(np.clip(round(tr_f), 0, n)) if np.isfinite(tr_f) else 0
        lo_frac = r_lo / n
        if 0.05 <= lo_frac <= 0.95:
            break
        # degenerate split (sigma outside the bulk): nudge toward the
        # other side using the diagonal quantiles
        q = 0.25 if lo_frac > 0.95 else 0.75
        sigma = float(np.quantile(diag, q))
    if r_lo == 0 or r_lo == n:
        # spectrum would not split by value (near-multiple of identity).
        # Splitting a (near-)degenerate eigenspace by ANY orthogonal
        # decomposition is exact, so force a half split; the recursion
        # bottoms out at the direct eigh either way.
        r_lo = n // 2
        P_lo = 0.5 * jnp.eye(n, dtype=A.dtype)

    V_lo = _orthonormal_range(P_lo, r_lo, seed=seed * 7919 + 13 + _depth)
    P_hi = jnp.eye(n, dtype=A.dtype) - P_lo
    V_hi = _orthonormal_range(P_hi, n - r_lo,
                              seed=seed * 7919 + 101 + _depth)
    # one Gram-Schmidt sweep of V_hi against V_lo keeps the combined basis
    # orthonormal to f32 roundoff even when the projector leaked slightly
    V_hi = _qr_q(_project_out(V_lo, V_hi))

    # validation: the two bases must (nearly) decouple A, else the split
    # was not invariant and results would be silently wrong
    AV_lo = jnp.dot(A, V_lo, precision=_HI)
    coupling = float(jnp.max(jnp.abs(jnp.dot(V_hi.T, AV_lo, precision=_HI))))
    scale = float(jnp.max(jnp.abs(A))) + 1e-30
    if not np.isfinite(coupling) or coupling > 2e-2 * scale:
        raise RuntimeError(
            f"eigh_dc: subspace split left coupling {coupling:.2e} "
            f"(scale {scale:.2e}); falling back to a dense eigh is required")
    A_lo = jnp.dot(V_lo.T, AV_lo, precision=_HI)
    A_hi = _rayleigh_block(A, V_hi)
    ev_lo, U_lo = eigh_dc(A_lo, max_block, seed + 1, _depth + 1)
    ev_hi, U_hi = eigh_dc(A_hi, max_block, seed + 2, _depth + 1)
    U = jnp.concatenate(
        [_back_transform(V_lo, U_lo), _back_transform(V_hi, U_hi)], axis=1
    )
    ev = jnp.concatenate([ev_lo, ev_hi])
    # ascending across the two blocks (value split guarantees order up to
    # projector leakage; a final argsort makes it exact)
    order = jnp.argsort(ev)
    return ev[order], U[:, order]
