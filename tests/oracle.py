"""Dense float64 NumPy oracle mirroring the reference pyGEMMA semantics.

Written fresh from the mathematical spec of the reference (SURVEY.md §3):
dense projection matrices (reference ``compute_Pc``, pygemma_model.pyx:1421-
1432), decade bracketing + scipy brentq(rtol=0.1) + safeguarded Newton
(pyx:135-194, 1349-1416), argmax-likelihood multi-root selection, MIN_VAL
clamps.  Used as the golden standard for every numerical test and as the
honest CPU comparator for benchmarks.
"""

from __future__ import annotations

import numpy as np
from scipy import optimize, stats

MIN_VAL = 1e-35


def mod_eig(lam, ev):
    return lam * ev + 1.0


def proj(ev, V, lam):
    """P_V = H^-1 - H^-1 V (V'H^-1V)^-1 V'H^-1 with H = diag(lam*ev+1)."""
    d = 1.0 / mod_eig(lam, ev)
    DV = d[:, None] * V
    M = np.linalg.inv(V.T @ DV)
    return np.diag(d) - DV @ M @ DV.T


def quad(P, a, b):
    return float(a @ P @ b)


def d1_restricted(lam, ev, y, V):
    n, q = V.shape
    P = proj(ev, V, lam)
    yPy = max(quad(P, y, y), MIN_VAL)
    yPPy = max(quad(P @ P, y, y), 0.0)
    trP = np.trace(P)
    return -0.5 * (n - q - trP) / lam + 0.5 * (n - q) * ((yPy - yPPy) / lam) / yPy


def d2_restricted(lam, ev, y, V):
    n, q = V.shape
    P = proj(ev, V, lam)
    P2 = P @ P
    yPy = max(quad(P, y, y), MIN_VAL)
    yPPy = max(quad(P2, y, y), MIN_VAL)
    yPPPy = max(quad(P2 @ P, y, y), MIN_VAL)
    yPGPGPy = (yPy + yPPPy - 2.0 * yPPy) / lam**2
    yPGPy = (yPy - yPPy) / lam
    res = 0.5 * (n - q + np.trace(P2) - 2.0 * np.trace(P)) / lam**2
    return res - (n - q) * (yPGPGPy * yPy - 0.5 * yPGPy * yPGPy) / yPy**2


def loglik_restricted(lam, ev, y, V):
    """ell_R with the logdet(V'V) term omitted, matching the reference's
    precompute path (it passes logdet_Wt_W = 0; pygemma_model.pyx:106)."""
    n, q = V.shape
    h = mod_eig(lam, ev)
    d = 1.0 / h
    G1 = V.T @ (d[:, None] * V)
    P = proj(ev, V, lam)
    yPy = max(quad(P, y, y), MIN_VAL)
    res = 0.5 * (n - q) * np.log(0.5 * (n - q) / np.pi) - 0.5 * (n - q)
    res -= 0.5 * np.sum(np.log(h))
    res -= 0.5 * np.linalg.slogdet(G1)[1]
    res -= 0.5 * (n - q) * np.log(yPy)
    return res


def d1_ml(lam, ev, y, V):
    n = V.shape[0]
    h = mod_eig(lam, ev)
    P = proj(ev, V, lam)
    yPy = max(quad(P, y, y), MIN_VAL)
    yPPy = max(quad(P @ P, y, y), MIN_VAL)
    return -0.5 * (n - np.sum(1.0 / h)) / lam + 0.5 * n * (1.0 - yPPy / yPy) / lam


def d2_ml(lam, ev, y, V):
    n = V.shape[0]
    h = mod_eig(lam, ev)
    P = proj(ev, V, lam)
    P2 = P @ P
    yPy = max(quad(P, y, y), MIN_VAL)
    yPPy = max(quad(P2, y, y), MIN_VAL)
    yPPPy = max(quad(P2 @ P, y, y), MIN_VAL)
    yPGPGPy = (yPy + yPPPy - 2.0 * yPPy) / lam**2
    yPGPy = (yPy - yPPy) / lam
    res = 0.5 * (n + np.sum(h**-2.0) - 2.0 * np.sum(h**-1.0)) / lam**2
    return res - 0.5 * n * (2.0 * yPGPGPy - yPGPy * yPGPy / yPy) / yPy


def loglik_ml(lam, ev, y, V):
    n = V.shape[0]
    h = mod_eig(lam, ev)
    P = proj(ev, V, lam)
    yPy = max(quad(P, y, y), MIN_VAL)
    res = 0.5 * n * np.log(n / (2.0 * np.pi)) - 0.5 * n
    res -= 0.5 * np.sum(np.log(h))
    res -= 0.5 * n * np.log(yPy)
    return res


def newton_safeguarded(lam, d1f, d2f, lam_min, lam_max, rtol=1e-5, maxiter=100):
    """Reference ``newton`` (pygemma_model.pyx:1349-1416) semantics.

    Note: an out-of-bracket step BREAKS WITHOUT updating -- the reference's
    clamp assigns a dead local and returns the previous iterate
    (pyx:1398-1404)."""
    lam_root = lam
    for it in range(maxiter + 1):
        d1 = d1f(lam_root)
        d2 = d2f(lam_root)
        ratio = d1 / d2 if d2 != 0 else np.nan
        if np.sign(ratio) * np.sign(d1) * np.sign(d2) <= 0.0:
            break
        lam_new = lam_root - ratio
        if lam_new < lam_min or lam_new > lam_max:
            break
        if np.isnan(lam_new) or np.isinf(lam_new):
            break
        r_eps = abs(lam_new - lam_root) / abs(lam_root)
        lam_root = lam_new
        if r_eps < rtol:
            break
    return lam_root


def calc_lambda(ev, y, V, restricted=True, grid=False,
                pow_low=-5.0, pow_high=5.0):
    """Decade scan -> brentq -> Newton -> argmax-likelihood root selection,
    mirroring reference calc_lambda_restricted (pyx:64-234)."""
    if restricted:
        d1f = lambda l: d1_restricted(l, ev, y, V)
        d2f = lambda l: d2_restricted(l, ev, y, V)
        likf = lambda l: loglik_restricted(l, ev, y, V)
    else:
        d1f = lambda l: d1_ml(l, ev, y, V)
        d2f = lambda l: d2_ml(l, ev, y, V)
        likf = lambda l: loglik_ml(l, ev, y, V)

    n_dec = int(round(pow_high - pow_low))
    if grid:
        cands = [10.0**pow_low, 10.0**pow_high] + [
            10.0 ** (pow_low + i) for i in range(n_dec)
        ]
        liks = [likf(l) for l in cands]
        return cands[int(np.argmax(liks))]

    best_lam = 10.0**pow_low
    best_lik = likf(best_lam)
    lik_hi = likf(10.0**pow_high)
    if best_lik < lik_hi:
        best_lik, best_lam = lik_hi, 10.0**pow_high

    d1_prev = None
    for i in range(n_dec):
        lam0 = 10.0 ** (pow_low + i)
        lam1 = 10.0 ** (pow_low + i + 1)
        f0 = d1f(lam0) if d1_prev is None else d1_prev
        f1 = d1f(lam1)
        d1_prev = f1
        if np.copysign(1.0, f0) * np.copysign(1.0, f1) < 0:
            root = optimize.brentq(d1f, lam0, lam1, rtol=0.1, maxiter=100,
                                   disp=False)
            root = newton_safeguarded(root, d1f, d2f, lam0, lam1)
            lik = likf(root)
            if lik > best_lik:
                best_lik, best_lam = lik, root
    return best_lam


def assoc_scan(ev, W, y, X, grid=False, tests=("wald",)):
    """Full per-SNP scan in rotated space; inputs already rotated by U'."""
    n, c = W.shape
    out = {k: [] for k in ("beta", "se_beta", "tau", "lambda", "F_wald",
                           "p_wald")}
    if "lrt" in tests:
        out["p_lrt"] = []
        lam0_ml = calc_lambda(ev, y, W, restricted=False, grid=grid)
        l0 = loglik_ml(lam0_ml, ev, y, W)
    if "score" in tests:
        out["p_score"] = []
        lam0_reml = calc_lambda(ev, y, W, restricted=True, grid=grid)
        P0 = proj(ev, W, lam0_reml)

    for g in range(X.shape[1]):
        x = X[:, g]
        V = np.c_[W, x]
        lam = calc_lambda(ev, y, V, restricted=True, grid=grid)
        Pc = proj(ev, W, lam)
        Px = proj(ev, V, lam)
        xPx = max(quad(Pc, x, x), MIN_VAL)
        beta = quad(Pc, x, y) / xPx
        yPxy = max(quad(Px, y, y), MIN_VAL)
        se = np.sqrt(yPxy) / (np.sqrt(xPx) * np.sqrt(n - c - 1))
        tau = (n - c - 1) / yPxy
        F = (beta / se) ** 2
        out["beta"].append(beta)
        out["se_beta"].append(se)
        out["tau"].append(tau)
        out["lambda"].append(lam)
        out["F_wald"].append(F)
        out["p_wald"].append(stats.f.sf(F, 1, n - c - 1))
        if "lrt" in tests:
            lam_ml = calc_lambda(ev, y, V, restricted=False, grid=grid)
            D = 2.0 * (loglik_ml(lam_ml, ev, y, V) - l0)
            out["p_lrt"].append(stats.chi2.sf(D, 1))
        if "score" in tests:
            xP0x = max(quad(P0, x, x), MIN_VAL)
            xP0y = quad(P0, x, y)
            yP0y = max(quad(P0, y, y), MIN_VAL)
            Fs = n * xP0y**2 / (yP0y * xP0x)
            out["p_score"].append(stats.f.sf(Fs, 1, n - c - 1))
    return {k: np.asarray(v) for k, v in out.items()}


def simulate(n=300, p=40, c=3, seed=0, h2=0.4):
    """Kinship-correlated GWAS simulator (reference simulate_gwas_dataset,
    tests/test_pygemma.py:301-332, re-derived)."""
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.05, 0.5, size=p)
    G = rng.binomial(2, maf[None, :], size=(n, p)).astype(np.float64)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    K = G @ G.T / p
    K += 1e-4 * np.eye(n)  # PSD guard
    W = np.c_[np.ones(n), rng.normal(size=(n, c - 1))] if c > 1 else np.ones((n, 1))
    u = rng.multivariate_normal(np.zeros(n), K)
    beta_true = np.zeros(p)
    causal = rng.choice(p, size=max(1, p // 10), replace=False)
    beta_true[causal] = rng.normal(size=causal.size)
    g = G @ beta_true
    e = rng.normal(size=n)
    y = g + np.sqrt(h2) * u + np.sqrt(1 - h2) * e
    y = (y - y.mean()) / y.std()
    return y, G, W, K
