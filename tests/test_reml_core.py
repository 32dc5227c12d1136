"""Unit tests: Gram-based REML scalars vs the dense float64 oracle.

Replaces the reference's print-and-eyeball identity checks
(tests/test_pygemma.py:227-235) with asserted tolerances.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from pygemma_tpu.config import GwasConfig
from pygemma_tpu.core import reml
from pygemma_tpu.core.grams import (
    grams_per_snp_lambda,
    grams_shared_lambda,
    pair_products,
    permute_x_before_y,
)
from pygemma_tpu.core.solver import LambdaProblem, evaluate


@pytest.fixture(scope="module")
def data():
    y, G, W, K = oracle.simulate(n=180, p=12, c=3, seed=7)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    yr = U.T @ y
    Wr = U.T @ W
    Xr = U.T @ G
    return ev, Wr, yr, Xr


def _build(data, lam, per_snp, ks=(1, 2, 3)):
    ev, W, y, X = data
    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    v2 = v * v
    if per_snp:
        lam_arr = jnp.full((X.shape[1],), lam, jnp.float64)
        grams, sums = grams_per_snp_lambda(
            lam_arr, jnp.asarray(ev), shared, pairs, v, v2, ks, want_logh=True
        )
    else:
        grams, sums = grams_shared_lambda(
            jnp.asarray(lam, jnp.float64), jnp.asarray(ev), shared, pairs, v,
            v2, ks, want_logh=True,
        )
    c = W.shape[1]
    grams = tuple(permute_x_before_y(A, c) for A in grams)
    return grams, sums


@pytest.mark.parametrize("lam", [1e-3, 0.7, 5.0, 400.0, 1e5])
@pytest.mark.parametrize("per_snp", [False, True])
def test_scalars_match_dense_oracle(data, lam, per_snp):
    ev, W, y, X = data
    n, c = W.shape
    grams, sums = _build(data, lam, per_snp)
    scal = reml.reml_scalars(grams[0], grams[1], grams[2], sums, c + 1,
                             need_third=True)
    for g in range(X.shape[1]):
        V = np.c_[W, X[:, g]]
        P = oracle.proj(ev, V, lam)
        P2 = P @ P
        np.testing.assert_allclose(scal.yPy[g], y @ P @ y, rtol=1e-8)
        np.testing.assert_allclose(scal.yPPy[g], y @ P2 @ y, rtol=1e-8)
        np.testing.assert_allclose(scal.yPPPy[g], y @ P2 @ P @ y, rtol=1e-7)
        np.testing.assert_allclose(scal.trP[g], np.trace(P), rtol=1e-8)
        np.testing.assert_allclose(scal.trPP[g], np.trace(P2), rtol=1e-8)
        d = 1.0 / (lam * ev + 1.0)
        G1 = V.T @ (d[:, None] * V)
        np.testing.assert_allclose(
            scal.logdet_G1[g], np.linalg.slogdet(G1)[1], rtol=1e-8, atol=1e-10
        )


@pytest.mark.parametrize("lam", [1e-2, 3.0, 2e3])
def test_predictor_terms_match(data, lam):
    ev, W, y, X = data
    c = W.shape[1]
    grams, _ = _build(data, lam, per_snp=False, ks=(1,))
    xPx, xPy, yPy = reml.predictor_terms(grams[0], c)
    Pc = oracle.proj(ev, W, lam)
    for g in range(X.shape[1]):
        x = X[:, g]
        np.testing.assert_allclose(xPx[g], x @ Pc @ x, rtol=1e-8)
        np.testing.assert_allclose(xPy[g], x @ Pc @ y, rtol=1e-8)
        np.testing.assert_allclose(yPy[g], y @ Pc @ y, rtol=1e-8)


@pytest.mark.parametrize("lam", [1e-4, 0.5, 10.0, 1e4])
@pytest.mark.parametrize("restricted", [True, False])
def test_derivatives_and_likelihood_match(data, lam, restricted):
    ev, W, y, X = data
    n, c = W.shape
    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, c + 1,
                         True, restricted)
    lam_j = jnp.asarray(lam, jnp.float64)
    d1 = evaluate(prob, lam_j, "d1", True)
    d1n, d2n = evaluate(prob, lam_j, "newton", True)
    lik = evaluate(prob, lam_j, "lik", True)
    for g in range(X.shape[1]):
        V = np.c_[W, X[:, g]]
        if restricted:
            ref_d1 = oracle.d1_restricted(lam, ev, y, V)
            ref_d2 = oracle.d2_restricted(lam, ev, y, V)
            ref_l = oracle.loglik_restricted(lam, ev, y, V)
        else:
            ref_d1 = oracle.d1_ml(lam, ev, y, V)
            ref_d2 = oracle.d2_ml(lam, ev, y, V)
            ref_l = oracle.loglik_ml(lam, ev, y, V)
        np.testing.assert_allclose(d1[g], ref_d1, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(d1n[g], ref_d1, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(d2n[g], ref_d2, rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(lik[g], ref_l, rtol=1e-8)


def test_autodiff_consistency(data):
    """d1/d2 hand-derived forms agree with jax.grad of ell_R -- the lever the
    reference prototype validated (tests/jax_pygemma.py:328-329)."""
    import jax

    ev, W, y, X = data
    n, c = W.shape
    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X[:, :3])
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, c + 1,
                         True, True)

    def lik_scalar(lam):
        return evaluate(prob, lam, "lik", True)

    for lam in [0.05, 2.0, 300.0]:
        lam_j = jnp.asarray(lam, jnp.float64)
        g_auto = jax.jacfwd(lik_scalar)(lam_j)
        d1 = evaluate(prob, lam_j, "d1", True)
        np.testing.assert_allclose(np.asarray(g_auto), np.asarray(d1),
                                   rtol=1e-5, atol=1e-9)
