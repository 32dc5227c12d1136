"""Mouse-panel-style GWAS pipeline (reference experiments/animal_gwas/run_gwas.py).

Mirrors the reference app end to end: genotype load -> mean imputation ->
GRM -> PCA covariates -> LMM scan -> lambda_GC -> manhattan + QQ plots.
The reference's mouse_hs1940 genotype matrix is not distributable, so the
default input is a simulated panel with the same shape characteristics
(1,940 mice x 12k SNPs); pass --bfile to run on real PLINK data.
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
    ap.add_argument("--bfile", help="PLINK prefix; default = simulated panel")
    ap.add_argument("--n", type=int, default=1940)
    ap.add_argument("--p", type=int, default=12226)
    ap.add_argument("--pcs", type=int, default=2)
    ap.add_argument("--out-dir", default="output")
    args = ap.parse_args()

    from pygemma_tpu import pygemma
    from pygemma_tpu import preprocess as pp
    from pygemma_tpu.io.kinship import kinship_blocked
    from pygemma_tpu.plotting import manhattan_plot, qq_plot

    os.makedirs(args.out_dir, exist_ok=True)

    if args.bfile:
        from pygemma_tpu.io import read_bed

        d = read_bed(args.bfile)
        X, names = pp.mean_impute(d.X), d.snp_ids
        chrom, pos = d.chrom, d.pos
        # phenotype expected as <bfile>.pheno.txt, one value per line
        from pygemma_tpu.io import bimbam

        y = bimbam.read_pheno(args.bfile + ".pheno.txt")
        keep = np.isfinite(y)
        y, X = y[keep], X[keep]
    else:
        from pygemma_tpu.sim import simulate_gwas

        d = simulate_gwas(n=args.n, p=args.p, n_causal=10, pve=0.3,
                          h2_poly=0.4, seed=1940)
        X, y, names = d.X, d.Y, [f"rs{i}" for i in range(args.p)]
        chrom = np.repeat(np.arange(1, 20), int(np.ceil(args.p / 19)))[: args.p]
        pos = np.arange(args.p)

    X, names, keepc = pp.drop_zero_variance(X, names)
    chrom, pos = chrom[keepc], pos[keepc]

    K = kinship_blocked(X)  # GRM (reference :45-55)
    W = np.c_[np.ones(len(y)), pp.pca_covariates(X, n_pcs=args.pcs)]

    t0 = time.time()
    df = pygemma(y, X, W, K, snps=names, verbose=1)
    print(f"scan: {time.time() - t0:.1f}s", file=sys.stderr)
    df["chrom"], df["pos"] = chrom, pos

    lam_gc = pp.genomic_control_lambda(df["p_wald"])
    print(f"lambda_GC = {lam_gc:.4f}")  # reference :185

    df.to_csv(os.path.join(args.out_dir, "assoc.tsv"), sep="\t", index=False)
    manhattan_plot(df, save_path=os.path.join(args.out_dir, "manhattan.png"))
    qq_plot(df["p_wald"], save_path=os.path.join(args.out_dir, "qq.png"))
    print(f"wrote {args.out_dir}/assoc.tsv + plots")


if __name__ == "__main__":
    main()
