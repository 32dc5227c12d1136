"""Host-driven spectral divide-and-conquer eigh (core/eigh_dc.py).

On the real backend it exists because ``jnp.linalg.eigh`` cannot compile
beyond n=8,192; on CPU we force tiny ``max_block`` so the splitter recurses
multiple levels and is validated against the dense float64 eigh."""

import numpy as np
import pytest

from pygemma_tpu.core.eigh_dc import eigh_dc


def _check(A, ev, U, ev_tol=2e-4, resid_tol=5e-4):
    n = A.shape[0]
    ev = np.asarray(ev)
    U = np.asarray(U)
    ev_ref = np.linalg.eigvalsh(np.asarray(A, np.float64))
    scale = np.abs(ev_ref).max()
    # ascending + eigenvalue parity
    np.testing.assert_allclose(np.sort(ev), ev)
    np.testing.assert_allclose(ev, ev_ref, rtol=5e-4, atol=ev_tol * scale)
    # orthonormal basis
    np.testing.assert_allclose(U.T @ U, np.eye(n), atol=5e-4)
    # eigenvector residual
    resid = np.asarray(A, np.float64) @ U - U * ev[None, :]
    assert np.abs(resid).max() < resid_tol * scale


def test_eigh_dc_two_level_gram(rng):
    """GRM-like PSD spectrum, forced 2+ levels of recursion."""
    n = 300
    G = rng.standard_normal((n, 150)).astype(np.float32)
    A = (G @ G.T / 150 + 1e-3 * np.eye(n)).astype(np.float32)
    ev, U = eigh_dc(A, max_block=96)
    _check(A, ev, U)


def test_eigh_dc_wide_spectrum(rng):
    """Spread eigenvalues across decades (lambda search range)."""
    n = 200
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.geomspace(1e-3, 1e3, n)
    A = (Q * vals[None, :]) @ Q.T
    A = ((A + A.T) / 2).astype(np.float32)
    ev, U = eigh_dc(A, max_block=64)
    ev_ref = np.linalg.eigvalsh(A.astype(np.float64))
    # wide-spread spectra: relative accuracy on the large end, absolute on
    # the small end (f32 Gram arithmetic floor ~1e-4 * ||A||)
    np.testing.assert_allclose(np.asarray(ev), ev_ref, rtol=5e-3,
                               atol=2e-3 * np.abs(ev_ref).max())
    U = np.asarray(U)
    np.testing.assert_allclose(U.T @ U, np.eye(n), atol=5e-4)


def test_eigh_dc_small_passthrough(rng):
    """n <= max_block delegates straight to the built-in eigh."""
    n = 40
    G = rng.standard_normal((n, n)).astype(np.float32)
    A = (G + G.T) / 2
    ev, U = eigh_dc(A, max_block=64)
    _check(A, ev, U, ev_tol=5e-5, resid_tol=2e-4)


def test_eigh_dc_near_identity():
    """A (near-)multiple of the identity cannot split by value; any
    orthogonal decomposition of the degenerate eigenspace is exact, so the
    forced half-split must still produce a valid eigendecomposition."""
    A = (3.5 * np.eye(64)).astype(np.float32)
    ev, U = eigh_dc(A, max_block=16)
    np.testing.assert_allclose(np.asarray(ev), 3.5, rtol=1e-5)
    U = np.asarray(U)
    np.testing.assert_allclose(U.T @ U, np.eye(64), atol=5e-4)


def test_eigh_dc_negative_and_positive(rng):
    """Indefinite symmetric matrix (splitter must handle signs)."""
    n = 150
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.linspace(-5.0, 5.0, n)
    A = ((Q * vals[None, :]) @ Q.T).astype(np.float32)
    A = (A + A.T) / 2
    ev, U = eigh_dc(A, max_block=48)
    _check(A, ev, U)


def test_eigh_dc_degenerate_cluster_spanning_median():
    """Regression: K = GG'/p + eps I with n > p has an (n-p)-fold
    degenerate eps eigenvalue; when that cluster spans the split quantile,
    a sigma INSIDE it stalls the sign iteration and mixed one cluster
    direction into the wrong Rayleigh block (one eigenvalue off ~100x,
    first seen at n=2500/p=1200/max_block=1024).  The gap-aware sigma
    (_spectral_quantile) must place the cut in the cluster/bulk gap."""
    rng = np.random.default_rng(17)
    n, p = 2500, 1200
    G = rng.standard_normal((n, p)).astype(np.float32)
    A = (G @ G.T / p + 1e-3 * np.eye(n)).astype(np.float32)
    ev, U = eigh_dc(A, max_block=1024)
    ev_h = np.asarray(ev)
    ev_ref = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.abs(ev_ref).max()
    np.testing.assert_allclose(ev_h, ev_ref, rtol=5e-3, atol=5e-4 * scale)
    U_h = np.asarray(U)
    np.testing.assert_allclose(U_h.T @ U_h, np.eye(n), atol=1e-3)
    resid = np.abs(A.astype(np.float64) @ U_h - U_h * ev_h[None, :]).max()
    assert resid < 5e-3 * scale


def test_residual_repair_fixes_planted_mixture():
    """The per-eigenpair certificate (_residual_repair) must detect and
    exactly repair a planted rotation between two eigenvector columns --
    the defect class the D&C can produce when a split stalls on a
    degenerate cluster (coupling checks stay clean, residuals do not)."""
    import jax.numpy as jnp

    from pygemma_tpu.core.eigh_dc import _pair_residuals, _residual_repair

    rng = np.random.default_rng(5)
    n = 256
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vals = np.sort(rng.uniform(0.5, 4.0, size=n))
    A = ((Q * vals[None, :]) @ Q.T).astype(np.float32)
    ev_ref = np.linalg.eigvalsh(A.astype(np.float64))
    ev0, U0 = np.linalg.eigh(A.astype(np.float64))
    # plant a 45-degree mixture between two well-separated eigenvectors
    i, j = 40, 200
    c = np.cos(np.pi / 4)
    Um = U0.copy()
    Um[:, i] = c * U0[:, i] + c * U0[:, j]
    Um[:, j] = -c * U0[:, i] + c * U0[:, j]
    evm = jnp.asarray(ev0.astype(np.float32))
    Um = jnp.asarray(Um.astype(np.float32))
    s, _, _ = _pair_residuals(jnp.asarray(A), Um, evm)
    assert float(jnp.max(s)) > 0.1  # the defect is loud in the residual
    ev_r, U_r = _residual_repair(jnp.asarray(A), evm, Um, verbose=False)
    ev_rh = np.sort(np.asarray(ev_r))
    np.testing.assert_allclose(ev_rh, ev_ref, rtol=2e-5,
                               atol=1e-5 * np.abs(ev_ref).max())
    U_rh = np.asarray(U_r)
    np.testing.assert_allclose(U_rh.T @ U_rh, np.eye(n), atol=5e-4)
    resid = np.abs(A.astype(np.float64) @ U_rh
                   - U_rh * np.asarray(ev_r)[None, :]).max()
    assert resid < 2e-4 * np.abs(ev_ref).max()
