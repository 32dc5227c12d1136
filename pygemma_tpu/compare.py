"""Cross-tool oracle bridge: run the real GEMMA binary and parse its output.

Parity with reference tests/gemma_utils.py:17-56 (write BIMBAM inputs, shell
``gemma -lmm``, parse output.assoc.txt).  The binary is located via $GEMMA or
PATH; absence degrades to None so test harnesses can skip rather than fail
(the reference hardcodes a cluster path, tests/gemma_utils.py:14).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional

import numpy as np
import pandas as pd

from .io import bimbam


def find_gemma() -> Optional[str]:
    return os.environ.get("GEMMA") or shutil.which("gemma")


def run_gemma(
    Y: np.ndarray,
    X: np.ndarray,
    W: Optional[np.ndarray],
    K: np.ndarray,
    snps: Optional[List[str]] = None,
    lmm_mode: int = 1,  # 1=Wald 2=LRT 3=score 4=all (GEMMA -lmm)
    workdir: Optional[str] = None,
) -> Optional[pd.DataFrame]:
    """Run GEMMA on the given matrices; None when no binary is available."""
    binary = find_gemma()
    if binary is None:
        return None
    n, p = X.shape
    snps = snps or [f"rs{i}" for i in range(p)]
    tmp = workdir or tempfile.mkdtemp(prefix="gemma_bridge_")
    os.makedirs(tmp, exist_ok=True)
    geno = os.path.join(tmp, "geno.txt")
    pheno = os.path.join(tmp, "pheno.txt")
    kin = os.path.join(tmp, "kinship.txt")
    bimbam.write_geno(geno, X, snps)
    bimbam.write_pheno(pheno, np.asarray(Y).reshape(-1))
    bimbam.write_matrix(kin, K)
    cmd = [binary, "-g", geno, "-p", pheno, "-k", kin,
           "-lmm", str(lmm_mode), "-o", "bridge", "-outdir", tmp,
           "-notsnp", "-miss", "1", "-maf", "0", "-r2", "1"]
    if W is not None:
        covar = os.path.join(tmp, "covar.txt")
        bimbam.write_matrix(covar, W)
        cmd += ["-c", covar]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    out = os.path.join(tmp, "bridge.assoc.txt")
    if res.returncode != 0 or not os.path.exists(out):
        raise RuntimeError(f"GEMMA failed: {res.stderr[-2000:]}")
    return pd.read_csv(out, sep=r"\s+")


def compare_pvalues(df_ours: pd.DataFrame, df_gemma: pd.DataFrame,
                    col_ours: str = "p_wald",
                    col_gemma: str = "p_wald") -> dict:
    """Summary statistics of agreement (the reference eyeballs scatter plots,
    tests/test_pygemma.py:536-866; here: quantified)."""
    a = -np.log10(np.maximum(np.asarray(df_ours[col_ours], float), 1e-300))
    b = -np.log10(np.maximum(np.asarray(df_gemma[col_gemma], float), 1e-300))
    m = np.isfinite(a) & np.isfinite(b)
    return {
        "n": int(m.sum()),
        "max_abs_dlog10p": float(np.max(np.abs(a[m] - b[m]))) if m.any() else np.nan,
        "corr_log10p": float(np.corrcoef(a[m], b[m])[0, 1]) if m.sum() > 2 else np.nan,
    }
