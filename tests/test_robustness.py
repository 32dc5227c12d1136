"""Edge-case robustness and statistical calibration.

The reference's statistical sanity checks are QQ plots and lambda_GC
eyeballing (SURVEY.md §4.4); here they are asserted.
"""

import numpy as np
import pytest

import oracle
from pygemma_tpu import GwasConfig, pygemma
from pygemma_tpu.preprocess import genomic_control_lambda

CFG = GwasConfig(dtype="float64", snp_block=64)


@pytest.mark.parametrize("n,p,c", [(60, 1, 1), (50, 3, 1), (80, 130, 2)])
def test_odd_shapes(n, p, c):
    y, G, W, K = oracle.simulate(n=n, p=max(p, 40), c=c, seed=n + p)
    df = pygemma(y, G[:, :p], W, K, config=CFG)
    assert len(df) == p
    assert np.isfinite(df["p_wald"]).all()


def test_single_block_larger_than_p():
    y, G, W, K = oracle.simulate(n=70, p=10, c=2, seed=3)
    df = pygemma(y, G, W, K, config=GwasConfig(dtype="float64",
                                               snp_block=4096))
    assert len(df) == 10 and np.isfinite(df["p_wald"]).all()


def test_null_phenotype_calibration():
    """Pure-noise phenotype with real relatedness: p-values uniform,
    lambda_GC ~ 1 (the reference checks this by QQ plot)."""
    rng = np.random.default_rng(12)
    n, p = 300, 400
    G = rng.binomial(2, rng.uniform(0.1, 0.5, p)[None, :], (n, p)).astype(float)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    K = G @ G.T / p + 1e-4 * np.eye(n)
    u = rng.multivariate_normal(np.zeros(n), K)
    y = 0.6 * u + 0.8 * rng.normal(size=n)  # polygenic-only, no causal SNP...
    W = np.ones((n, 1))
    df = pygemma(y, G, W, K, config=CFG)
    lam_gc = genomic_control_lambda(df["p_wald"])
    assert 0.7 < lam_gc < 1.3, lam_gc
    # uniformity: KS-style check on deciles
    h, _ = np.histogram(df["p_wald"], bins=10, range=(0, 1))
    assert h.max() < 2.5 * h.mean()


def test_extreme_heritability_lambda_endpoints():
    """Nearly-pure-genetic and nearly-pure-noise phenotypes drive lambda to
    the bracket endpoints without NaNs (clamping semantics, pyx:101-117)."""
    rng = np.random.default_rng(5)
    n, p = 150, 30
    G = rng.normal(size=(n, p))
    K = G @ G.T / p + 1e-3 * np.eye(n)
    W = np.ones((n, 1))
    u = rng.multivariate_normal(np.zeros(n), K)
    # almost pure genetic signal -> lambda huge
    df_hi = pygemma(u + 1e-3 * rng.normal(size=n), G, W, K, config=CFG)
    assert np.isfinite(df_hi["p_wald"]).all()
    assert (df_hi["lambda"] > 1e3).mean() > 0.5
    # pure noise, diag-dominant K -> lambda small
    df_lo = pygemma(rng.normal(size=n), G, W, np.eye(n) * 1.0 + 0.001 * K,
                    config=CFG)
    assert np.isfinite(df_lo["p_wald"]).all()


def test_constant_phenotype_no_crash():
    y, G, W, K = oracle.simulate(n=80, p=8, c=1, seed=8)
    df = pygemma(np.ones(80), G, W, K, config=CFG)
    assert len(df) == 8  # garbage stats are fine; no exception


def test_float32_vs_float64_consistency_moderate_scale():
    y, G, W, K = oracle.simulate(n=400, p=64, c=3, seed=44)
    df32 = pygemma(y, G, W, K, config=GwasConfig(dtype="float32",
                                                 snp_block=64))
    df64 = pygemma(y, G, W, K, config=CFG)
    lp32 = -np.log10(np.maximum(df32["p_wald"], 1e-300))
    lp64 = -np.log10(np.maximum(df64["p_wald"], 1e-300))
    assert np.nanmax(np.abs(lp32 - lp64)) < 0.1
