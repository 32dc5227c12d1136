"""Independent end-to-end parity vs *reference-authored* code.

Round-1 correctness evidence all flowed through tests/oracle.py, written by
the same author as the engine.  These tests close that loop with code the
reference authors wrote (/root/reference/lmm/pygemma_clean.py, imported
read-only) and with a vendored golden CSV generated from it
(tests/golden/gen_golden.py), so the parity check survives without the
reference mounted.

What is reference-authored here: the restricted log-likelihood
``likelihood_restricted_lambda`` (pygemma_clean.py:232-250), the dense
projection ``compute_Pc`` (:105-109), and the beta/SE/tau extraction
``calc_beta_vg_ve_restricted`` (:85-103).  The file's own lambda *solver*
cannot be used as committed -- see gen_golden.py's docstring for the three
verified bugs (NameError at :321; d1 sign at :170 vs pyx:1625; missing 0.5
in d2 at :190 vs pyx:1696) -- so lambda parity is established three ways
that need none of the broken pieces:

 1. grid-mode lambda must equal the argmax of the reference-authored
    likelihood over the decade grid, exactly;
 2. the Brent/Newton lambda* must carry an *optimality certificate* under
    the reference-authored likelihood (beats every grid point; the central
    finite-difference derivative of the reference likelihood vanishes at
    interior roots);
 3. the engine's float64 oracle likelihood must differ from the
    reference-authored likelihood by a lambda-independent constant only
    (hence identical derivatives/roots/argmax).
"""

import csv
import importlib.util
import os

import numpy as np
import pytest
from scipy import stats

import oracle
from pygemma_tpu import GwasConfig, pygemma

REFERENCE = "/root/reference/lmm/pygemma_clean.py"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_parity_n200_p40_c3_seed77.csv")

N, P, C, SEED = 200, 40, 3, 77
GRID = np.power(10.0, np.arange(-5.0, 6.0))

CFG64 = GwasConfig(dtype="float64", snp_block=64)


def _load_reference():
    spec = importlib.util.spec_from_file_location("ref_clean", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def data():
    y, G, W, K = oracle.simulate(n=N, p=P, c=C, seed=SEED)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    return y, G, W, K, ev, U.T @ W, U.T @ y, U.T @ G


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as fh:
        rows = list(csv.DictReader(fh))
    return {
        k: np.array([float(r[k]) for r in rows])
        for k in rows[0] if k != "snp"
    }


def test_grid_lambda_and_stats_match_golden(data, golden):
    """Engine grid=True output vs the vendored reference-authored CSV."""
    y, G, W, K = data[:4]
    df = pygemma(y, G, W, K, config=CFG64.replace(grid=True))
    # grid argmax is discrete: must agree exactly
    np.testing.assert_allclose(df["lambda"], golden["lambda_grid"],
                               rtol=1e-12)
    # float64 engine vs float64 reference code at the same lambda
    np.testing.assert_allclose(df["beta"], golden["beta"], rtol=1e-9)
    np.testing.assert_allclose(df["se_beta"], golden["se_beta"], rtol=1e-9)
    np.testing.assert_allclose(df["tau"], golden["tau"], rtol=1e-9)
    np.testing.assert_allclose(df["F_wald"], golden["F_wald"], rtol=1e-8)
    np.testing.assert_allclose(df["p_wald"], golden["p_wald"], rtol=1e-8)


def test_float32_engine_tracks_golden(data, golden):
    """The production float32 path must track the reference-authored numbers
    (this is the BASELINE 'match reference pyGEMMA' north star at test
    scale)."""
    y, G, W, K = data[:4]
    df = pygemma(y, G, W, K,
                 config=GwasConfig(dtype="float32", snp_block=64, grid=True))
    np.testing.assert_allclose(df["lambda"], golden["lambda_grid"],
                               rtol=1e-6)
    np.testing.assert_allclose(df["beta"], golden["beta"], rtol=5e-3,
                               atol=1e-6)
    np.testing.assert_allclose(df["se_beta"], golden["se_beta"], rtol=5e-3)
    lp = -np.log10(np.maximum(df["p_wald"], 1e-300))
    lpr = -np.log10(np.maximum(golden["p_wald"], 1e-300))
    np.testing.assert_allclose(lp, lpr, rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(not os.path.exists(REFERENCE),
                    reason="reference tree not mounted")
def test_golden_csv_matches_live_reference(data, golden):
    """Regenerating from the live reference must reproduce the vendored CSV
    (guards against golden-file drift in either direction)."""
    _, _, _, _, ev, Wr, yr, Xr = data
    ref = _load_reference()
    n = Wr.shape[0]
    I = np.eye(n)
    for g in range(0, Xr.shape[1], 5):  # spot-check every 5th SNP
        xg = Xr[:, g]
        V = np.c_[Wr, xg]
        liks = [ref.likelihood_restricted_lambda(l, ev, I, yr, V)
                for l in GRID]
        lam = float(GRID[int(np.argmax(liks))])
        np.testing.assert_allclose(lam, golden["lambda_grid"][g], rtol=1e-12)
        beta, se, tau = ref.calc_beta_vg_ve_restricted(ev, I, Wr, xg, lam, yr)
        np.testing.assert_allclose(beta, golden["beta"][g], rtol=1e-10)
        np.testing.assert_allclose(se, golden["se_beta"][g], rtol=1e-10)
        np.testing.assert_allclose(tau, golden["tau"][g], rtol=1e-10)


@pytest.mark.skipif(not os.path.exists(REFERENCE),
                    reason="reference tree not mounted")
def test_oracle_likelihood_equals_reference_up_to_constant(data):
    """tests/oracle.py's l_R and the reference-authored l_R must differ by a
    lambda-independent constant only => identical derivatives, roots and
    argmax.  This independently certifies the oracle every other test leans
    on."""
    _, _, _, _, ev, Wr, yr, Xr = data
    ref = _load_reference()
    n = Wr.shape[0]
    I = np.eye(n)
    lams = np.power(10.0, np.linspace(-5, 5, 21))
    for g in [0, 7, 19, 33]:
        V = np.c_[Wr, Xr[:, g]]
        diffs = np.array([
            ref.likelihood_restricted_lambda(l, ev, I, yr, V)
            - oracle.loglik_restricted(l, ev, yr, V)
            for l in lams
        ])
        assert diffs.max() - diffs.min() < 1e-10, (
            f"snp {g}: offset varies with lambda: {diffs}"
        )


@pytest.mark.skipif(not os.path.exists(REFERENCE),
                    reason="reference tree not mounted")
def test_newton_lambda_certified_by_reference_likelihood(data):
    """Brent/Newton lambda* from the engine: (a) beats every decade grid
    point under the reference-authored likelihood, (b) zeroes its central
    finite-difference derivative at interior roots, and (c) reproduces the
    reference-authored beta/SE/tau/F/p at lambda* to float64 accuracy."""
    y, G, W, K, ev, Wr, yr, Xr = data
    ref = _load_reference()
    n, c = Wr.shape
    I = np.eye(n)
    df = pygemma(y, G, W, K, config=CFG64)

    for g in range(Xr.shape[1]):
        xg = Xr[:, g]
        V = np.c_[Wr, xg]
        lam = float(df["lambda"][g])
        l_star = ref.likelihood_restricted_lambda(lam, ev, I, yr, V)
        l_grid = max(ref.likelihood_restricted_lambda(l, ev, I, yr, V)
                     for l in GRID)
        assert l_star >= l_grid - 1e-9, (
            f"snp {g}: lambda*={lam} not optimal under reference likelihood"
        )
        if 1e-5 < lam < 1e5:
            h = lam * 1e-4
            lp = ref.likelihood_restricted_lambda(lam + h, ev, I, yr, V)
            lm = ref.likelihood_restricted_lambda(lam - h, ev, I, yr, V)
            d1 = (lp - lm) / (2 * h)
            curv = abs((lp + lm - 2 * l_star) / h**2)
            assert abs(d1) <= 10 * curv * lam * 1e-3 + 1e-6, (
                f"snp {g}: reference d(l_R)/dlam = {d1:.3e} at lambda*={lam}"
            )
        beta, se, tau = ref.calc_beta_vg_ve_restricted(ev, I, Wr, xg, lam, yr)
        F = (beta / se) ** 2
        p = stats.f.sf(F, 1, n - c - 1)
        np.testing.assert_allclose(df["beta"][g], beta, rtol=1e-10)
        np.testing.assert_allclose(df["se_beta"][g], se, rtol=1e-10)
        np.testing.assert_allclose(df["tau"][g], tau, rtol=1e-10)
        np.testing.assert_allclose(df["F_wald"][g], F, rtol=1e-9)
        np.testing.assert_allclose(df["p_wald"][g], p, rtol=1e-9)


REF_DATA = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
def test_real_mouse_hs1940_phenotypes_end_to_end(tmp_path):
    """Real-data fixture run: the reference's bundled mouse_hs1940 phenotype
    table (1,940 mice, NA-coded missing values, 6 phenotype columns;
    reference data/mouse_hs1940.pheno.txt, used by
    experiments/animal_gwas/run_gwas.py:67-96) drives the engine end to end.
    Genotypes are simulated (the reference prunes its genotype blobs too,
    .MISSING_LARGE_BLOBS) with real SNP names and anno positions, so this
    exercises real-shape NA filtering, kinship, and anno-joined plotting."""
    import pandas as pd

    from pygemma_tpu import GwasConfig, pygemma
    from pygemma_tpu import preprocess as pp
    from pygemma_tpu.io.kinship import kinship_blocked
    from pygemma_tpu.plotting import manhattan_plot

    pheno = pd.read_csv(os.path.join(REF_DATA, "mouse_hs1940.pheno.txt"),
                        sep="\t", header=None, na_values="NA")
    anno = pd.read_csv(os.path.join(REF_DATA, "mouse_hs1940.anno.txt"),
                       sep="\t", header=None,
                       names=["rs", "pos", "chr", "cm"])
    y_all = pheno[0].values.astype(np.float32)  # CD8 phenotype column
    assert len(y_all) == 1940 and np.isnan(y_all).sum() > 0

    # drop NA-phenotype individuals (run_gwas.py behavior)
    keep = np.isfinite(y_all)
    y = y_all[keep]
    n = int(keep.sum())
    p = 256
    rng = np.random.default_rng(1940)
    X = rng.binomial(2, rng.uniform(0.1, 0.5, p)[None, :],
                     size=(n, p)).astype(np.float32)
    X, names_kept, mask = pp.drop_zero_variance(
        X, anno["rs"].tolist()[:p])
    K = kinship_blocked(pp.standardize(X, eps=1e-6))
    K = K + 1e-4 * np.eye(n, dtype=np.float32)

    df = pygemma(y, X, None, K, snps=names_kept,
                 config=GwasConfig(snp_block=256))
    assert np.isfinite(df["p_wald"]).mean() > 0.95
    lam_gc = pp.genomic_control_lambda(df["p_wald"])
    assert 0.5 < lam_gc < 2.0  # null-ish simulated genotypes

    # join real anno positions for the manhattan plot
    df = df.merge(anno, left_on="SNPs", right_on="rs", how="left")
    df["chrom"] = df["chr"]
    manhattan_plot(df, save_path=str(tmp_path / "mh.png"))
    assert os.path.exists(tmp_path / "mh.png")


@pytest.mark.skipif(not os.path.isdir(REF_DATA),
                    reason="reference data not mounted")
def test_real_bxd_covariates_fixture():
    """The reference's BXD covariate table (data/BXD_covariates.txt) as a
    real covariate fixture: tab-separated numeric columns with trailing
    tabs, used directly as W."""
    import pandas as pd

    from pygemma_tpu import GwasConfig, pygemma

    W_raw = pd.read_csv(os.path.join(REF_DATA, "BXD_covariates.txt"),
                        sep="\t", header=None).dropna(axis=1, how="all")
    W = np.c_[np.ones(len(W_raw)), W_raw.values.astype(np.float32)]
    n = W.shape[0]
    assert n == 198
    y, G, _, K = oracle.simulate(n=n, p=24, c=1, seed=449)
    df = pygemma(y, G, W, K, config=GwasConfig(dtype="float64", snp_block=24))
    assert np.isfinite(df["p_wald"]).all()


# --- formula-level-independent LRT / score certification -------------------
# The reference never implemented LRT or score (scaffolding commented out,
# reference lmm/lmm.py:137-141, :277-300), so no reference-authored numbers
# exist.  The vendored golden below comes from a SECOND in-repo
# implementation that shares no code path with the engine: dense
# original-space H = lambda*K + I solves (no eigendecomposition, rotation,
# or Gram recursions) and brute likelihood maximization (no derivative
# bracketing) -- see tests/golden/gen_golden_lrt_score.py.

GOLDEN_LS = os.path.join(os.path.dirname(__file__), "golden",
                         "lrt_score_golden_n200_p40_c3_seed99.csv")


@pytest.fixture(scope="module")
def golden_ls():
    with open(GOLDEN_LS) as fh:
        rows = [r for r in csv.DictReader(fh)
                if not r["snp"].startswith("#")]
    return {
        k: np.array([float(r[k]) for r in rows])
        for k in rows[0] if k != "snp"
    }


def test_lrt_score_match_independent_golden(golden_ls):
    """LRT and score p-values vs the dense-H brute-maximization golden
    (round-4 verdict weak #5: previously certified only by same-author
    oracle code)."""
    y, G, W, K = oracle.simulate(n=N, p=P, c=C, seed=99)
    df = pygemma(y, G, W, K, config=CFG64,
                 tests=("wald", "lrt", "score"))

    # Wald cross-check rides along for free
    np.testing.assert_allclose(df["lambda"], golden_ls["lambda_reml"],
                               rtol=2e-4)
    np.testing.assert_allclose(df["beta"], golden_ls["beta"], rtol=1e-6)
    np.testing.assert_allclose(df["se_beta"], golden_ls["se_beta"],
                               rtol=1e-6)
    np.testing.assert_allclose(df["p_wald"], golden_ls["p_wald"], rtol=1e-5)

    # LRT: ML lambda, H1 log-likelihood, chi^2 p
    np.testing.assert_allclose(df["lambda_ml"], golden_ls["lambda_ml"],
                               rtol=2e-4)
    np.testing.assert_allclose(df["logl_H1"], golden_ls["logl_H1"],
                               rtol=1e-9)
    np.testing.assert_allclose(df["p_lrt"], golden_ls["p_lrt"], rtol=1e-5,
                               atol=1e-12)

    # score at the null REML lambda (the driver folds F_score into
    # p_score = F.sf(F_score, 1, n-c-1), so p carries the whole statistic)
    np.testing.assert_allclose(df["p_score"], golden_ls["p_score"],
                               rtol=1e-5)
