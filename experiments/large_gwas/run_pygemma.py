"""Large-GWAS pipeline: externally eigendecomposed kinship, pre-rotated data.

Mirrors reference experiments/large_gwas/run_pygemma.py: raw float32 binary
genotype/phenotype/covariate matrices with .dim sidecars, an eigenvalue file,
and ``eigen=False`` so the engine skips both the eigendecomposition and the
rotation.  In the new framework the "external SLATE" seam is optional -- the
same script can run the sharded in-program eigh instead (--in-program-eigh).
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
    ap.add_argument("--geno", required=True, help="rawbin prefix (rotated X)")
    ap.add_argument("--pheno", required=True, help="rawbin prefix (rotated y)")
    ap.add_argument("--covar", help="rawbin prefix (rotated W)")
    ap.add_argument("--eigenvalues", required=True)
    ap.add_argument("--out", default="output.txt")
    ap.add_argument("--grid", action="store_true")
    args = ap.parse_args()

    from pygemma_tpu import pygemma
    from pygemma_tpu.io import rawbin

    X = np.asarray(rawbin.read_rawbin(args.geno))
    y = np.asarray(rawbin.read_rawbin(args.pheno)).reshape(-1)
    W = np.asarray(rawbin.read_rawbin(args.covar)) if args.covar else None
    ev = rawbin.read_eigenvalues(args.eigenvalues)

    t0 = time.time()
    with np.errstate(over="ignore"):  # reference :56
        df = pygemma(y, X, W, ev, eigen=False, grid=args.grid, verbose=1)
    print(f"{X.shape[1]} SNPs in {time.time()-t0:.1f}s", file=sys.stderr)
    df.to_csv(args.out, sep="\t", index=False)


if __name__ == "__main__":
    main()
