"""In-process smoke tests for the workload-layer scripts (tiny scale, CPU)."""

import os
import sys

import numpy as np
import pytest

_EXP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "experiments")


def _run_main(path, argv):
    import importlib.util

    spec = importlib.util.spec_from_file_location("exp_mod_" + os.path.basename(path), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [path] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_animal_gwas_pipeline(tmp_path):
    out = str(tmp_path / "out")
    _run_main(os.path.join(_EXP, "animal_gwas", "run_gwas.py"),
              ["--n", "80", "--p", "60", "--pcs", "1", "--out-dir", out])
    assert os.path.exists(os.path.join(out, "assoc.tsv"))
    assert os.path.exists(os.path.join(out, "manhattan.png"))


def test_eqtl_pipeline(tmp_path, monkeypatch):
    out = str(tmp_path / "eqtl")
    monkeypatch.setenv("TASK_ID", "0")
    monkeypatch.setenv("TASK_COUNT", "1")
    _run_main(os.path.join(_EXP, "eqtl", "run_genes.py"),
              ["--n", "60", "--p", "40", "--genes", "2", "--out-dir", out])
    assert os.path.exists(os.path.join(out, "gene0", "lmm.tsv"))
    assert os.path.exists(os.path.join(out, "gene1", "linreg.tsv"))


def test_case_control_pipeline(tmp_path):
    out = str(tmp_path / "cc")
    _run_main(os.path.join(_EXP, "case_control", "run.py"),
              ["--n-cases", "30", "--n-controls", "40", "--p", "50",
               "--linear", "--out-dir", out])
    assert os.path.exists(os.path.join(out, "lmm.tsv"))
    assert os.path.exists(os.path.join(out, "linreg.tsv"))


def test_large_gwas_pipeline(tmp_path):
    import oracle

    from pygemma_tpu.io import rawbin

    y, G, W, K = oracle.simulate(n=50, p=20, c=2, seed=6)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0)
    rawbin.write_rawbin(str(tmp_path / "geno"), (U.T @ G).astype(np.float32))
    rawbin.write_rawbin(str(tmp_path / "pheno"),
                        (U.T @ y).astype(np.float32)[:, None])
    rawbin.write_rawbin(str(tmp_path / "covar"), (U.T @ W).astype(np.float32))
    np.savetxt(str(tmp_path / "eig.txt"), ev)
    out = str(tmp_path / "out.txt")
    _run_main(os.path.join(_EXP, "large_gwas", "run_pygemma.py"),
              ["--geno", str(tmp_path / "geno"),
               "--pheno", str(tmp_path / "pheno"),
               "--covar", str(tmp_path / "covar"),
               "--eigenvalues", str(tmp_path / "eig.txt"),
               "--out", out])
    import pandas as pd

    df = pd.read_csv(out, sep="\t")
    assert len(df) == 20 and np.isfinite(df["p_wald"]).all()


def test_ukb_afr_pipeline(tmp_path):
    """Per-chromosome pipeline with imputation, PCs, shared eigh checkpoint,
    QQ/Manhattan artifacts, and null-model diagnostics
    (reference experiments/ukb_afr/code/run_snp.py, run_without_snp.py)."""
    out = str(tmp_path / "ukb")
    _run_main(os.path.join(_EXP, "ukb_afr", "run_chrom.py"),
              ["--n", "70", "--p-per-chrom", "30", "--chroms", "20,21",
               "--pcs", "2", "--null-diagnostics", "--out-dir", out])
    import pandas as pd

    for ch in (20, 21):
        df = pd.read_csv(os.path.join(out,
                                      f"pygemma_results_chr{ch}_pheno0.csv"))
        assert np.isfinite(df["p_wald"]).mean() > 0.8
        assert os.path.exists(os.path.join(out, f"chr{ch}_pheno0_wald_qq.png"))
    # null-model diagnostics artifacts (run_without_snp.py:96-111)
    assert os.path.exists(os.path.join(out, "residuals.png"))
    assert os.path.exists(os.path.join(out, "residuals_vs_fitted.png"))
    assert os.path.exists(os.path.join(out, "manhattan.png"))
    # eigendecomposition was shared across the chromosome loop
    assert os.path.exists(os.path.join(out, "checkpoint", "eigen.npz"))


def test_case_control_bimbam_crosscheck_writer(tmp_path):
    """--write-bimbam emits GEMMA cross-check inputs
    (reference run_pygemma_imputed.py:448-470)."""
    out = str(tmp_path / "cc")
    _run_main(os.path.join(_EXP, "case_control", "run.py"),
              ["--n-cases", "20", "--n-controls", "30", "--p", "40",
               "--write-bimbam", "--out-dir", out])
    from pygemma_tpu.io import bimbam

    X, names = bimbam.read_geno(os.path.join(out, "cc_genotypes.tsv"))
    y = bimbam.read_pheno(os.path.join(out, "cc_phenotypes.tsv"))
    K = bimbam.read_matrix(os.path.join(out, "cc_kinship.txt"))
    assert X.shape[0] == 50 and len(y) == 50 and K.shape == (50, 50)
    assert set(np.unique(y)) <= {0.0, 1.0}


def test_config_scenarios_smoke(capsys):
    sys.path.insert(0, os.path.dirname(_EXP))
    import importlib.util

    path = os.path.join(os.path.dirname(_EXP), "configs", "run_config.py")
    spec = importlib.util.spec_from_file_location("cfgrun", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.mouse_hs1940(scale=0.03)
    mod.bxd(scale=0.05)
    out = capsys.readouterr().out
    assert "mouse_hs1940" in out and "bxd" in out
