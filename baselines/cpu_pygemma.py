"""Efficient CPU reference implementation (NumPy/SciPy), GEMMA method.

Serves as the honest CPU comparator for bench.py: it mirrors the reference
pyGEMMA algorithm and per-SNP cost profile -- decade bracketing + brentq
(rtol=0.1) + safeguarded Newton per SNP (reference pygemma_model.pyx:135-194,
1349-1416) with O(n * c^2) work per lambda evaluation via precomputed pair
products (the same trick as the reference's ``precompute_mat`` BLAS path /
GEMMA's CalcUab).  Written fresh from the math; no code ported.
"""

from __future__ import annotations

import numpy as np
from scipy import optimize, stats

MIN_VAL = 1e-35


class SnpWorkspace:
    """Per-SNP pair-product cache: T = [W, x, y], E[:, (i,j)] = T_i * T_j."""

    def __init__(self, ev, W, y, x):
        self.ev = ev
        n, c = W.shape
        self.n, self.c = n, c
        T = np.concatenate([W, x[:, None], y[:, None]], axis=1)  # (n, c+2)
        t = c + 2
        iu, ju = np.triu_indices(t)
        self.iu, self.ju = iu, ju
        self.t = t
        self.E = T[:, iu] * T[:, ju]  # (n, m)

    def grams(self, lam, kmax):
        """Return [A_1..A_kmax] (t, t) plus (sum_d, sum_d2, sum_logh)."""
        h = lam * self.ev + 1.0
        d = 1.0 / h
        out = []
        dk = d
        sum_d = d.sum()
        sum_d2 = (d * d).sum()
        for k in range(1, kmax + 1):
            S = self.E.T @ dk  # (m,)
            A = np.zeros((self.t, self.t))
            A[self.iu, self.ju] = S
            A[self.ju, self.iu] = S
            out.append(A)
            dk = dk * d
        return out, sum_d, sum_d2, float(np.log(h).sum())


def _scalars(A_list, sum_d, sum_d2, q, third=False):
    A1 = A_list[0]
    G1 = A1[:q, :q]
    u1 = A1[:q, -1]
    s1 = A1[-1, -1]
    L = np.linalg.cholesky(G1)
    Mu1 = np.linalg.solve(G1, u1)
    yPy = s1 - u1 @ Mu1
    logdet_G1 = 2.0 * np.log(np.diag(L)).sum()
    res = {"yPy": yPy, "logdet_G1": logdet_G1}
    if len(A_list) > 1:
        A2 = A_list[1]
        G2 = A2[:q, :q]
        u2 = A2[:q, -1]
        s2 = A2[-1, -1]
        G2Mu1 = G2 @ Mu1
        res["yPPy"] = s2 - 2 * u2 @ Mu1 + Mu1 @ G2Mu1
        MG2 = np.linalg.solve(G1, G2)
        res["trP"] = sum_d - np.trace(MG2)
        if third:
            A3 = A_list[2]
            G3 = A3[:q, :q]
            u3 = A3[:q, -1]
            s3 = A3[-1, -1]
            w = u2 - G2Mu1
            res["yPPPy"] = (
                s3 - 2 * u3 @ Mu1 + Mu1 @ (G3 @ Mu1) - w @ np.linalg.solve(G1, w)
            )
            res["trPP"] = (
                sum_d2 - 2 * np.trace(np.linalg.solve(G1, G3))
                + np.trace(MG2 @ MG2)
            )
    return res


def _d1(lam, ws, q):
    A, sd, sd2, _ = ws.grams(lam, 2)
    s = _scalars(A, sd, sd2, q)
    n = ws.n
    yPy = max(s["yPy"], MIN_VAL)
    return (
        -0.5 * (n - q - s["trP"]) / lam
        + 0.5 * (n - q) * ((yPy - max(s["yPPy"], 0.0)) / lam) / yPy
    )


def _d2(lam, ws, q):
    A, sd, sd2, _ = ws.grams(lam, 3)
    s = _scalars(A, sd, sd2, q, third=True)
    n = ws.n
    yPy = max(s["yPy"], MIN_VAL)
    yPPy = max(s["yPPy"], MIN_VAL)
    yPPPy = max(s["yPPPy"], MIN_VAL)
    yPGPGPy = (yPy + yPPPy - 2 * yPPy) / lam**2
    yPGPy = (yPy - yPPy) / lam
    r = 0.5 * (n - q + s["trPP"] - 2 * s["trP"]) / lam**2
    return r - (n - q) * (yPGPGPy * yPy - 0.5 * yPGPy**2) / yPy**2


def _lik(lam, ws, q):
    A, sd, sd2, slh = ws.grams(lam, 1)
    s = _scalars(A, sd, sd2, q)
    n = ws.n
    r = 0.5 * (n - q) * np.log(0.5 * (n - q) / np.pi) - 0.5 * (n - q)
    r -= 0.5 * slh
    r -= 0.5 * s["logdet_G1"]
    r -= 0.5 * (n - q) * np.log(max(s["yPy"], MIN_VAL))
    return r


def calc_lambda_restricted(ws, q, pow_low=-5.0, pow_high=5.0):
    best_lam = 10.0**pow_low
    best_lik = _lik(best_lam, ws, q)
    lik_hi = _lik(10.0**pow_high, ws, q)
    if best_lik < lik_hi:
        best_lik, best_lam = lik_hi, 10.0**pow_high
    f_prev = None
    for i in range(int(round(pow_high - pow_low))):
        lam0 = 10.0 ** (pow_low + i)
        lam1 = 10.0 ** (pow_low + i + 1)
        f0 = _d1(lam0, ws, q) if f_prev is None else f_prev
        f1 = _d1(lam1, ws, q)
        f_prev = f1
        if np.copysign(1.0, f0) * np.copysign(1.0, f1) < 0:
            root = optimize.brentq(lambda l: _d1(l, ws, q), lam0, lam1,
                                   rtol=0.1, maxiter=100, disp=False)
            # safeguarded Newton (reference pyx:1349-1416)
            lam_root = root
            for _ in range(101):
                d1v = _d1(lam_root, ws, q)
                d2v = _d2(lam_root, ws, q)
                ratio = d1v / d2v if d2v != 0 else np.nan
                if np.sign(ratio) * np.sign(d1v) * np.sign(d2v) <= 0:
                    break
                lam_new = lam_root - ratio
                # out-of-bracket: break WITHOUT updating (reference
                # pyx:1398-1404 clamp is a dead local)
                if lam_new < lam0 or lam_new > lam1:
                    break
                if np.isnan(lam_new) or np.isinf(lam_new):
                    break
                r_eps = abs(lam_new - lam_root) / abs(lam_root)
                lam_root = lam_new
                if r_eps < 1e-5:
                    break
            lik = _lik(lam_root, ws, q)
            if lik > best_lik:
                best_lik, best_lam = lik, lam_root
    return best_lam


def run_gwas(ev, W_rot, y_rot, X_rot):
    """Rotated-space Wald scan; returns dict of per-SNP arrays."""
    n, c = W_rot.shape
    out = {k: [] for k in ("beta", "se_beta", "tau", "lambda", "F_wald",
                           "p_wald")}
    for g in range(X_rot.shape[1]):
        x = X_rot[:, g]
        ws = SnpWorkspace(ev, W_rot, y_rot, x)
        lam = calc_lambda_restricted(ws, c + 1)
        A, sd, sd2, _ = ws.grams(lam, 1)
        A1 = A[0]
        # beta/se against null design W (indices :c), x at c, y at c+1
        Gw = A1[:c, :c]
        ux = A1[:c, c]
        uy = A1[:c, c + 1]
        Mux = np.linalg.solve(Gw, ux)
        Muy = np.linalg.solve(Gw, uy)
        xPx = A1[c, c] - ux @ Mux
        xPy = A1[c, c + 1] - ux @ Muy
        s_full = _scalars(A, sd, sd2, c + 1)
        yPxy = max(s_full["yPy"], MIN_VAL)
        beta = xPy / xPx
        se = np.sqrt(yPxy) / (np.sqrt(max(xPx, MIN_VAL)) * np.sqrt(n - c - 1))
        tau = (n - c - 1) / yPxy
        F = (beta / se) ** 2
        out["beta"].append(beta)
        out["se_beta"].append(se)
        out["tau"].append(tau)
        out["lambda"].append(lam)
        out["F_wald"].append(F)
        out["p_wald"].append(stats.f.sf(F, 1, n - c - 1))
    return {k: np.asarray(v) for k, v in out.items()}


# --- whole-node parallel baseline ------------------------------------------
# The reference's intra-node parallelism is fork + read-only shared arrays +
# Pool.imap over contiguous SNP column blocks (reference lmm/lmm.py:363-401,
# 427-436).  Reproduced here so bench.py can report an honest NODE-level
# ratio (all host cores), not just the per-core one.  fork() copy-on-write
# gives workers the same zero-copy read-only view the reference built with
# multiprocessing.Array.

_POOL_CTX: dict = {}


def _pool_init(ev, W_rot, y_rot, X_rot):
    _POOL_CTX["args"] = (ev, W_rot, y_rot, X_rot)


def _pool_work(blk):
    s, e = blk
    ev, W, y, X = _POOL_CTX["args"]
    return run_gwas(ev, W, y, X[:, s:e])


def _pool_noop(_):
    return None


def run_gwas_pool(ev, W_rot, y_rot, X_rot, nproc=None, timer=None):
    """Rotated-space Wald scan fanned over ``nproc`` processes
    (default: all host cores), reference Pool semantics.

    ``timer``: optional 1-element list; receives the STEADY-STATE wall
    seconds of the scan itself -- workers are spun up and warmed with a
    no-op map first, so process startup (which real runs amortize over
    ~100k SNPs) does not pollute a small benchmark subset.  Uses the
    "spawn" context: forking a process whose JAX runtime already started
    threads can deadlock."""
    import multiprocessing as mp
    import os
    import time

    nproc = int(nproc or os.cpu_count() or 1)
    p = X_rot.shape[1]
    bounds = np.linspace(0, p, nproc + 1).astype(int)
    blocks = [(int(bounds[i]), int(bounds[i + 1]))
              for i in range(nproc) if bounds[i] < bounds[i + 1]]
    if len(blocks) <= 1:
        t0 = time.time()
        out = run_gwas(ev, W_rot, y_rot, X_rot)
        if timer is not None:
            timer[:] = [time.time() - t0]
        return out
    with mp.get_context("spawn").Pool(
            len(blocks), initializer=_pool_init,
            initargs=(ev, W_rot, y_rot, X_rot)) as pool:
        pool.map(_pool_noop, range(len(blocks)))  # spin-up + import warm
        t0 = time.time()
        outs = pool.map(_pool_work, blocks)
        if timer is not None:
            timer[:] = [time.time() - t0]
    return {k: np.concatenate([np.asarray(o[k]) for o in outs])
            for k in outs[0]}
