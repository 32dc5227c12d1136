"""Lambda-solver and end-to-end driver tests vs the float64 dense oracle.

The golden comparison replaces the reference's GEMMA-binary cross-check
(tests/gemma_utils.py:17-56) with an in-repo oracle that reproduces the
reference algorithm (brentq+Newton, argmax root selection) exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from pygemma_tpu import GwasConfig, pygemma
from pygemma_tpu.core.grams import pair_products
from pygemma_tpu.core.solver import LambdaProblem, solve_lambda


@pytest.fixture(scope="module")
def data():
    y, G, W, K = oracle.simulate(n=200, p=24, c=3, seed=11)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    return ev, U.T @ W, U.T @ y, U.T @ G


CFG64 = GwasConfig(dtype="float64", snp_block=32)


@pytest.mark.parametrize("restricted", [True, False])
def test_lambda_matches_oracle(data, restricted):
    ev, W, y, X = data
    n, c = W.shape
    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, c + 1,
                         True, restricted)
    lam_star, _ = solve_lambda(prob, CFG64)
    for g in range(X.shape[1]):
        V = np.c_[W, X[:, g]]
        ref = oracle.calc_lambda(ev, y, V, restricted=restricted)
        got = float(lam_star[g])
        if ref in (1e-5, 1e5) or got in (1e-5, 1e5):
            # endpoint selections must agree exactly
            np.testing.assert_allclose(got, ref, rtol=1e-6)
        else:
            np.testing.assert_allclose(got, ref, rtol=1e-3)


def test_lambda_grid_matches_oracle(data):
    ev, W, y, X = data
    n, c = W.shape
    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, c + 1,
                         True, True)
    lam_star, _ = solve_lambda(prob, CFG64.replace(grid=True))
    for g in range(X.shape[1]):
        ref = oracle.calc_lambda(ev, y, np.c_[W, X[:, g]], grid=True)
        np.testing.assert_allclose(float(lam_star[g]), ref, rtol=1e-12)


def test_e2e_wald_matches_oracle_float64():
    y, G, W, K = oracle.simulate(n=200, p=24, c=3, seed=23)
    df = pygemma(y, G, W, K, config=CFG64)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    ref = oracle.assoc_scan(ev, U.T @ W, U.T @ y, U.T @ G)
    # lambda roots agree to the Newton tolerance band; downstream statistics
    # inherit only a weak sensitivity to lambda near the optimum.
    np.testing.assert_allclose(df["lambda"], ref["lambda"], rtol=2e-3)
    np.testing.assert_allclose(df["beta"], ref["beta"], rtol=1e-3, atol=1e-10)
    np.testing.assert_allclose(df["se_beta"], ref["se_beta"], rtol=1e-3)
    np.testing.assert_allclose(df["tau"], ref["tau"], rtol=1e-3)
    np.testing.assert_allclose(df["p_wald"], ref["p_wald"], rtol=2e-3)


def test_e2e_float32_close_to_oracle():
    y, G, W, K = oracle.simulate(n=200, p=24, c=3, seed=31)
    df = pygemma(y, G, W, K, config=GwasConfig(dtype="float32", snp_block=32))
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    ref = oracle.assoc_scan(ev, U.T @ W, U.T @ y, U.T @ G)
    np.testing.assert_allclose(df["beta"], ref["beta"], rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(df["se_beta"], ref["se_beta"], rtol=5e-3)
    # p-values on -log10 scale within 2%
    lp = -np.log10(np.maximum(df["p_wald"], 1e-300))
    lpr = -np.log10(np.maximum(ref["p_wald"], 1e-300))
    np.testing.assert_allclose(lp, lpr, rtol=2e-2, atol=2e-2)


def test_e2e_lrt_score():
    y, G, W, K = oracle.simulate(n=150, p=12, c=2, seed=5)
    df = pygemma(y, G, W, K, tests=("wald", "lrt", "score"), config=CFG64)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    ref = oracle.assoc_scan(ev, U.T @ W, U.T @ y, U.T @ G,
                            tests=("wald", "lrt", "score"))
    np.testing.assert_allclose(df["p_wald"], ref["p_wald"], rtol=1e-3)
    np.testing.assert_allclose(df["p_lrt"], ref["p_lrt"], rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(df["p_score"], ref["p_score"], rtol=1e-3)


def test_e2e_eigen_false_precomputed():
    """Reference eigen=False path: rotated inputs + eigenvalue vector
    (experiments/large_gwas/run_pygemma.py:57-65)."""
    y, G, W, K = oracle.simulate(n=150, p=12, c=2, seed=9)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    df_direct = pygemma(y, G, W, K, config=CFG64)
    df_pre = pygemma(U.T @ y, U.T @ G, U.T @ W, ev, eigen=False, config=CFG64)
    np.testing.assert_allclose(df_pre["p_wald"], df_direct["p_wald"],
                               rtol=1e-8)


def test_e2e_de_mode():
    """DE mode swaps outcome and predictor (lmm/lmm.py:498-532)."""
    y, G, W, K = oracle.simulate(n=120, p=6, c=2, seed=13)
    df = pygemma(y, G, W, K, de=True, config=CFG64)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    Wr, yr, Xr = U.T @ W, U.T @ y, U.T @ G
    # oracle for DE: per SNP, outcome x_g, design [W, y]
    n, c = W.shape
    for g in range(G.shape[1]):
        xg = Xr[:, g]
        V = np.c_[Wr, yr]
        lam = oracle.calc_lambda(ev, xg, V, restricted=True)
        Pc = oracle.proj(ev, Wr, lam)
        Px = oracle.proj(ev, V, lam)
        yPy = max(yr @ Pc @ yr, oracle.MIN_VAL)
        beta = (yr @ Pc @ xg) / yPy
        xPvx = max(xg @ Px @ xg, oracle.MIN_VAL)
        se = np.sqrt(xPvx) / (np.sqrt(yPy) * np.sqrt(n - c - 1))
        np.testing.assert_allclose(df["beta"][g], beta, rtol=1e-3)
        np.testing.assert_allclose(df["se_beta"][g], se, rtol=1e-3)


def test_multi_phenotype_and_snp_names():
    y, G, W, K = oracle.simulate(n=100, p=8, c=2, seed=17)
    Y2 = np.c_[y, y[::-1]]
    names = [f"rs{i}" for i in range(G.shape[1])]
    df = pygemma(Y2, G, W, K, snps=names, config=CFG64)
    assert len(df) == 2 * G.shape[1]
    assert set(df["pheno"]) == {0, 1}
    assert list(df["SNPs"][: G.shape[1]]) == names


def test_nan_containment():
    """A constant (zero-variance) SNP must yield a NaN row, not an exception
    (reference lmm/lmm.py:484-493)."""
    y, G, W, K = oracle.simulate(n=100, p=8, c=2, seed=19)
    G = G.copy()
    G[:, 3] = 0.0
    df = pygemma(y, G, W, K, config=CFG64)
    assert not np.isfinite(df["p_wald"][3]) or np.isnan(df["beta"][3])
    good = [i for i in range(8) if i != 3]
    assert np.isfinite(df["p_wald"][good]).all()


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_lambda_parity_fuzz(seed):
    """Randomized datasets: lambda and p-values track the oracle."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(60, 160))
    c = int(rng.integers(1, 4))
    y, G, W, K = oracle.simulate(n=n, p=6, c=c, seed=seed,
                                 h2=float(rng.uniform(0.1, 0.7)))
    df = pygemma(y, G, W, K, config=GwasConfig(dtype="float64", snp_block=6))
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0)
    ref = oracle.assoc_scan(ev, U.T @ W, U.T @ y, U.T @ G)
    np.testing.assert_allclose(df["lambda"], ref["lambda"], rtol=3e-3)
    np.testing.assert_allclose(df["p_wald"], ref["p_wald"], rtol=5e-3,
                               atol=1e-12)


def test_solver_branch_parity():
    """Data-dependent refinement batching must not change results.

    A block whose total sign-change-bracket count exceeds B refines roots in
    several compacted batches; padding the same block with no-root lanes
    drops the count under B and refines in one.  The shared lanes must
    produce identical lambdas -- compaction/batching only changes *where*
    each root is refined.
    """
    y, G, W, K = oracle.simulate(n=150, p=12, c=2, seed=23)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    Wr, yr, Xr = U.T @ W, U.T @ y, U.T @ G
    n, c = Wr.shape
    shared = jnp.asarray(np.c_[Wr, yr])
    pairs = pair_products(shared)

    v = jnp.asarray(Xr)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, c + 1,
                         True, True)
    lam_small, lik_small = solve_lambda(prob, CFG64)

    # pad with constant columns (zero after centering -> no refinable root)
    pad = np.zeros((n, 40), dtype=Xr.dtype)
    v2b = jnp.asarray(np.c_[Xr, pad])
    prob_b = LambdaProblem(jnp.asarray(ev), shared, pairs, v2b, v2b * v2b,
                           n, c + 1, True, True)
    lam_big, lik_big = solve_lambda(prob_b, CFG64)

    np.testing.assert_allclose(np.asarray(lam_big)[:12],
                               np.asarray(lam_small), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lik_big)[:12],
                               np.asarray(lik_small), rtol=1e-12)


def _multiroot_fixture(n_out=96):
    """Eigen-spectrum + outcome block whose REML derivative has 0..4 decade
    sign changes per lane (log-uniform eigenvalues over 10 decades make
    multimodal restricted likelihoods common at tiny n)."""
    rng = np.random.default_rng(147)
    n = int(rng.integers(8, 30))  # 9
    ev = 10.0 ** rng.uniform(-5, 5, size=n)
    W = np.ones((n, 1))
    Y = np.random.default_rng(0).normal(size=(n, n_out))
    return ev, W, Y


def test_solver_refines_every_bracket_multiroot_fuzz():
    """Regression (round-1 verdict, missing #6): the reference refines EVERY
    sign-change bracket (pyx:154-194); the solver previously capped at 2.
    Lanes here have up to 4 brackets; lambda* must match the all-bracket
    oracle on every lane, and the fixture must actually contain >=3-bracket
    lanes so this test keeps guarding the multi-root path."""
    ev, W, Y = _multiroot_fixture()
    n = len(ev)
    decades = [10.0 ** e for e in range(-5, 6)]

    sign_changes = []
    for t in range(Y.shape[1]):
        d1 = [oracle.d1_restricted(l, ev, Y[:, t], W) for l in decades]
        s = np.sign(d1)
        sign_changes.append(int(np.sum(s[:-1] * s[1:] < 0)))
    assert max(sign_changes) >= 3, "fixture lost its multi-root lanes"

    shared = jnp.asarray(W)
    pairs = pair_products(shared)
    v = jnp.asarray(Y)
    # permute=False: design = W, outcome = each lane of v (null-model shape)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, 1,
                         False, True)
    lam_star, _ = solve_lambda(prob, CFG64)
    for t in range(Y.shape[1]):
        ref = oracle.calc_lambda(ev, Y[:, t], W, restricted=True)
        got = float(lam_star[t])
        if ref in (1e-5, 1e5) or got in (1e-5, 1e5):
            np.testing.assert_allclose(got, ref, rtol=1e-6,
                                       err_msg=f"lane {t} ({sign_changes[t]} brackets)")
        else:
            np.testing.assert_allclose(got, ref, rtol=1e-3,
                                       err_msg=f"lane {t} ({sign_changes[t]} brackets)")


def test_solver_multibatch_compaction():
    """Total roots >> B forces multiple compacted refinement batches; results
    must match the per-lane oracle regardless of how many batches run."""
    ev, W, Y = _multiroot_fixture(n_out=512)
    n = len(ev)
    decades = [10.0 ** e for e in range(-5, 6)]
    # keep only multi-bracket lanes, then use a tiny block so that
    # total_roots > B and several while_loop batches execute
    keep = []
    for t in range(Y.shape[1]):
        d1 = [oracle.d1_restricted(l, ev, Y[:, t], W) for l in decades]
        s = np.sign(d1)
        if int(np.sum(s[:-1] * s[1:] < 0)) >= 2:
            keep.append(t)
        if len(keep) == 12:
            break
    assert len(keep) == 12
    Yk = Y[:, keep]  # 12 lanes x >=2 roots each -> >= 24 roots, B = 12
    shared = jnp.asarray(W)
    pairs = pair_products(shared)
    v = jnp.asarray(Yk)
    prob = LambdaProblem(jnp.asarray(ev), shared, pairs, v, v * v, n, 1,
                         False, True)
    lam_star, _ = solve_lambda(prob, CFG64)
    for i, t in enumerate(keep):
        ref = oracle.calc_lambda(ev, Yk[:, i], W, restricted=True)
        got = float(lam_star[i])
        if ref in (1e-5, 1e5) or got in (1e-5, 1e5):
            np.testing.assert_allclose(got, ref, rtol=1e-6)
        else:
            np.testing.assert_allclose(got, ref, rtol=1e-3)
