"""Plain (non-mixed) linear regression scan, vectorized over SNPs.

Parity with the reference's linear-regression alternative path
(experiments/wtccc/run_pygemma.py:153-230, env LINEAR; and
experiments/1000G/run_lin_reg.py): per SNP x, OLS fit of
y ~ [W, x] and the Wald test on the x coefficient.  One jit over the whole
SNP block: residualize y and x against W once, then the per-SNP slope is a
pair of reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import stats


@partial(jax.jit, static_argnames=())
def _linreg_block(W, y, X):
    n, c = W.shape
    # residualize against W via normal equations (c is small)
    G = W.T @ W
    Winv = jnp.linalg.inv(G)
    proj = lambda v: v - W @ (Winv @ (W.T @ v))
    y_r = proj(y[:, None])[:, 0]
    X_r = X - W @ (Winv @ (W.T @ X))
    xx = jnp.sum(X_r * X_r, axis=0)
    xy = X_r.T @ y_r
    beta = xy / xx
    resid_ss = jnp.sum(y_r * y_r) - beta * xy
    df = n - c - 1
    sigma2 = resid_ss / df
    se = jnp.sqrt(sigma2 / xx)
    t = beta / se
    return beta, se, t


def linreg(Y, X, W=None, snps=None) -> pd.DataFrame:
    """OLS association scan -> DataFrame(beta, se_beta, t, p_wald)."""
    Y = np.asarray(Y, np.float32).reshape(-1)
    X = np.asarray(X, np.float32)
    n, p = X.shape
    if W is None:
        W = np.ones((n, 1), np.float32)
    W = np.asarray(W, np.float32)
    beta, se, t = _linreg_block(jnp.asarray(W), jnp.asarray(Y), jnp.asarray(X))
    df = n - W.shape[1] - 1
    t_h = np.asarray(t, np.float64)
    out = pd.DataFrame({
        "beta": np.asarray(beta),
        "se_beta": np.asarray(se),
        "t": t_h,
        "p_wald": 2.0 * stats.t.sf(np.abs(t_h), df),
    })
    if snps is not None:
        out["SNPs"] = list(snps)
    return out
