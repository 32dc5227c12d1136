"""1000G-style cis-eQTL pipeline: per-gene LMM + linear-regression scans.

Mirrors reference experiments/1000G (run_pyGEMMA.sh SLURM array over ~7,100
genes; run_snp.py per-gene LMM; run_lin_reg.py OLS): each "gene" is a
phenotype column scanned against the genotype matrix with a SHARED kinship
eigendecomposition -- the expensive O(n^3) step is paid once and reused for
every gene (the reference shares chr_all.sXX.txt the same way,
run_pyGEMMA.sh:22).  Work is sharded over genes with TASK_ID/TASK_COUNT.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--p", type=int, default=5000)
    ap.add_argument("--genes", type=int, default=8)
    ap.add_argument("--grid", action="store_true",
                    help="grid-search lambda init (reference benchmark mode)")
    ap.add_argument("--out-dir", default="eqtl_output")
    args = ap.parse_args()

    from pygemma_tpu import pygemma
    from pygemma_tpu.linreg import linreg
    from pygemma_tpu.core.eigen import auto_eigendecompose
    from pygemma_tpu.sim import simulate_gwas

    os.makedirs(args.out_dir, exist_ok=True)
    base = simulate_gwas(n=args.n, p=args.p, seed=1000)
    rngs = np.random.default_rng(7)
    # per-gene expression phenotypes with shared genetic background
    genes = {}
    for g in range(args.genes):
        d = simulate_gwas(n=args.n, p=args.p, seed=1000)  # same genotypes
        w = rngs.normal(size=args.p) * (rngs.random(args.p) < 0.002)
        genes[f"gene{g}"] = (base.X @ w
                             + 0.5 * rngs.normal(size=args.n)).astype(np.float32)

    # shared kinship + eigendecomposition, computed once (run_pyGEMMA.sh:22)
    ev, U = auto_eigendecompose(base.K, "auto", np.float32)
    ev, U = np.asarray(ev), np.asarray(U)
    Xr = (U.T @ base.X).astype(np.float32)
    Wr = (U.T @ base.W).astype(np.float32)

    task_id = int(os.environ.get("TASK_ID", 0))
    task_count = int(os.environ.get("TASK_COUNT", 1))
    names = sorted(genes)[task_id::task_count]

    for gene in names:
        y = genes[gene]
        yr = (U.T @ y).astype(np.float32)
        t0 = time.time()
        lmm = pygemma(yr, Xr, Wr, ev, eigen=False, grid=args.grid)
        ols = linreg(y, base.X, base.W)
        out = os.path.join(args.out_dir, gene)
        os.makedirs(out, exist_ok=True)
        lmm.to_csv(os.path.join(out, "lmm.tsv"), sep="\t", index=False)
        ols.to_csv(os.path.join(out, "linreg.tsv"), sep="\t", index=False)
        print(f"{gene}: {time.time()-t0:.1f}s "
              f"min p_lmm={np.nanmin(lmm['p_wald']):.2e} "
              f"min p_ols={np.nanmin(ols['p_wald']):.2e}", flush=True)


if __name__ == "__main__":
    main()
