"""Exact low-rank kinship eigendecomposition vs the dense path.

The decomposition must be EXACT (to f32 roundoff): same eigenvalues as a
dense eigh of K = s GG' + eps I, a complete orthonormal basis, and
end-to-end driver outputs matching the dense-K scan (reference seam:
experiments/large_gwas/run_pygemma.sh:10,28 -> lmm/lmm.py:196-211)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from pygemma_tpu import GwasConfig, LowRankKinship, pygemma
from pygemma_tpu.core.lowrank import lowrank_eigendecompose


@pytest.fixture
def lrk_case(rng):
    n, pk = 150, 60
    G = rng.binomial(2, 0.3, size=(n, pk)).astype(np.float32)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    lrk = LowRankKinship(G, eps=1e-3)
    return n, pk, G, lrk


def test_lowrank_matches_dense_eigh(lrk_case):
    n, pk, G, lrk = lrk_case
    K = lrk.dense()
    ev_d, U_d = lowrank_eigendecompose(lrk)
    ev_d = np.asarray(ev_d)
    U_d = np.asarray(U_d)

    # eigenvalues: complement all eps, top = Gram spectrum + eps, ascending
    ev_ref = np.linalg.eigvalsh(np.asarray(K, np.float64))
    assert ev_d.shape == (n,) and U_d.shape == (n, n)
    np.testing.assert_allclose(np.sort(ev_d), ev_d)  # ascending
    np.testing.assert_allclose(ev_d, ev_ref, rtol=2e-4, atol=2e-5)

    # complete orthonormal basis
    I = U_d.T @ U_d
    np.testing.assert_allclose(I, np.eye(n), atol=5e-5)

    # each column is an eigenvector: ||K u - ev u|| small
    resid = K.astype(np.float64) @ U_d - U_d * ev_d[None, :]
    assert np.abs(resid).max() < 5e-5


def test_lowrank_rank_deficient_gram(rng):
    """Duplicated SNP columns make the Gram rank-deficient; near-null
    directions must fold into the eps eigenspace, basis stays complete."""
    n, pk = 90, 40
    G = rng.binomial(2, 0.4, size=(n, pk)).astype(np.float32)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    G[:, 1] = G[:, 0]
    G[:, 2] = G[:, 0]
    lrk = LowRankKinship(G, eps=1e-3)
    ev_d, U_d = lowrank_eigendecompose(lrk)
    ev_d, U_d = np.asarray(ev_d), np.asarray(U_d)
    K = lrk.dense()
    ev_ref = np.linalg.eigvalsh(np.asarray(K, np.float64))
    np.testing.assert_allclose(ev_d, ev_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(U_d.T @ U_d, np.eye(n), atol=5e-5)
    resid = K.astype(np.float64) @ U_d - U_d * ev_d[None, :]
    assert np.abs(resid).max() < 1e-4


def test_lowrank_from_packed_source(rng):
    """LowRankKinship over a PackedMatrix source streams 2-bit codes."""
    from pygemma_tpu.io.packed import PackedMatrix

    n, pk = 100, 36
    codes = rng.integers(0, 3, size=(n, pk)).astype(np.uint8)
    Q = PackedMatrix.from_codes(codes)
    lrk = LowRankKinship(Q, eps=1e-3)
    ev_d, U_d = lowrank_eigendecompose(lrk, block=16)
    K = lrk.dense()
    ev_ref = np.linalg.eigvalsh(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(ev_d), ev_ref, rtol=2e-4,
                               atol=2e-5)


def test_pygemma_lowrank_matches_dense_scan(lrk_case):
    """End-to-end: driver with K=LowRankKinship reproduces the dense-K scan."""
    n, pk, G, lrk = lrk_case
    rng = np.random.default_rng(7)
    p = 30
    X = rng.binomial(2, 0.3, size=(n, p)).astype(np.float32)
    X = (X - X.mean(0)) / np.maximum(X.std(0), 1e-6)
    W = np.c_[np.ones(n), rng.standard_normal(n)].astype(np.float32)
    y = (0.4 * X[:, 0] + 0.5 * G[:, 3] + rng.standard_normal(n)
         ).astype(np.float32)
    cfg = GwasConfig(snp_block=16)
    df_lr = pygemma(y, X, W, lrk, config=cfg)
    df_d = pygemma(y, X, W, lrk.dense(), config=cfg)
    lg_lr = -np.log10(np.asarray(df_lr["p_wald"], np.float64))
    lg_d = -np.log10(np.asarray(df_d["p_wald"], np.float64))
    assert np.abs(lg_lr - lg_d).max() < 0.05
    np.testing.assert_allclose(df_lr["beta"], df_d["beta"], rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(df_lr["lambda"], df_d["lambda"], rtol=5e-3)


def test_lowrank_requires_pk_lt_n(rng):
    G = rng.standard_normal((10, 12)).astype(np.float32)
    with pytest.raises(ValueError, match="p_k < n"):
        LowRankKinship(G)
