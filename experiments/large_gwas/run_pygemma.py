"""Large-GWAS pipeline: externally eigendecomposed kinship, pre-rotated data.

Mirrors reference experiments/large_gwas/run_pygemma.py: raw float32 binary
genotype/phenotype/covariate matrices with .dim sidecars, an eigenvalue file,
and ``eigen=False`` so the engine skips both the eigendecomposition and the
rotation.  In the new framework the "external SLATE" seam
(reference experiments/large_gwas/run_pygemma.sh:10,28) is optional:
``--in-program-eigh`` takes UNrotated inputs and runs the eigendecomposition
inside the program instead -- the implicit low-rank path when the genotype
block is wide enough to define the GRM (K = X X'/p with p < n), else the
device/host eigh picked by ``eigh_backend`` -- optionally sharded over a
``--mesh N`` device mesh.
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
    ap.add_argument("--geno", required=True, help="rawbin prefix (rotated X, "
                    "or UNrotated with --in-program-eigh)")
    ap.add_argument("--pheno", required=True, help="rawbin prefix (rotated y)")
    ap.add_argument("--covar", help="rawbin prefix (rotated W)")
    ap.add_argument("--eigenvalues",
                    help="external eigenvalue file (the SLATE seam); "
                         "omit with --in-program-eigh")
    ap.add_argument("--in-program-eigh", action="store_true",
                    help="run the eigendecomposition in-program on UNrotated "
                         "inputs instead of consuming external eigenvalues")
    ap.add_argument("--kinship", help="rawbin prefix of a dense kinship for "
                    "--in-program-eigh; default builds the GRM from --geno")
    ap.add_argument("--lowrank-snps", type=int, default=0,
                    help="with --in-program-eigh and no --kinship: build an "
                         "implicit low-rank GRM from the first N genotype "
                         "columns (must be < n samples); 0 = dense GRM")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the eigh/scan over an N-device mesh")
    ap.add_argument("--out", default="output.txt")
    ap.add_argument("--grid", action="store_true")
    args = ap.parse_args()

    from pygemma_tpu import pygemma
    from pygemma_tpu.io import rawbin

    X = np.asarray(rawbin.read_rawbin(args.geno))
    y = np.asarray(rawbin.read_rawbin(args.pheno)).reshape(-1)
    W = np.asarray(rawbin.read_rawbin(args.covar)) if args.covar else None

    mesh = None
    if args.mesh:
        from pygemma_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(snp=args.mesh)

    if args.in_program_eigh:
        if args.kinship:
            K = np.asarray(rawbin.read_rawbin(args.kinship))
        elif args.lowrank_snps:
            from pygemma_tpu.core.lowrank import LowRankKinship

            K = LowRankKinship(X[:, : args.lowrank_snps], eps=1e-3)
        else:
            from pygemma_tpu.io.kinship import kinship_blocked

            K = kinship_blocked(X)
        eigen = True
    else:
        if not args.eigenvalues:
            raise SystemExit(
                "--eigenvalues required (or pass --in-program-eigh)")
        K = rawbin.read_eigenvalues(args.eigenvalues)
        eigen = False

    t0 = time.time()
    with np.errstate(over="ignore"):  # reference :56
        df = pygemma(y, X, W, K, eigen=eigen, grid=args.grid, verbose=1,
                     mesh=mesh)
    print(f"{X.shape[1]} SNPs in {time.time()-t0:.1f}s", file=sys.stderr)
    df.to_csv(args.out, sep="\t", index=False)


if __name__ == "__main__":
    main()
