"""Regenerate the reference-authored golden parity CSV.

Runs the *reference's own* pure-NumPy statistics code
(/root/reference/lmm/pygemma_clean.py) on the shared simulator and vendors
the per-SNP results, so parity against reference-authored numbers survives
without the reference mounted.

Usage:  python tests/golden/gen_golden.py   (requires /root/reference)

Why only the clean driver's *pieces* are used (and not its top-level
``pygemma`` / ``calc_lambda_restricted``): the in-tree file is an abandoned
sketch with three divergences from the production Cython path that we
verified line-by-line --
  * ``pygemma_clean.py:321`` references an undefined name ``x`` (NameError:
    ``calc_lambda_restricted`` always crashes as committed);
  * ``pygemma_clean.py:170`` has ``-0.5*(n-c)*...`` where the production
    kernel has ``+`` (pygemma_model.pyx:1625) -- a sign bug in dl_R/dlambda;
  * ``pygemma_clean.py:190`` drops the 0.5 factor on the squared-gradient
    term present in the production second derivative (pygemma_model.pyx:1696).
Its restricted log-likelihood ``likelihood_restricted_lambda`` and the
beta/SE/tau extraction ``calc_beta_vg_ve_restricted`` DO match production
semantics (the likelihood up to a lambda-independent additive constant,
which cannot affect argmax/roots), so those are the oracle surface here.

The eigenbasis-orientation quirk in ``compute_Pc`` (``U.T @ diag @ U``,
pygemma_clean.py:106, transposed relative to K = U diag U^T) is neutralized
by handing the reference code the pre-rotated problem with U = I.
"""

import csv
import importlib.util
import os
import sys

import numpy as np
from scipy import stats

REFERENCE = "/root/reference/lmm/pygemma_clean.py"
HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "ref_parity_n200_p40_c3_seed77.csv")

# the shared simulator (tests/oracle.py)
sys.path.insert(0, os.path.dirname(HERE))
import oracle  # noqa: E402

N, P, C, SEED = 200, 40, 3, 77
GRID = np.power(10.0, np.arange(-5.0, 6.0))  # decade points, pyx:99-132


def load_reference():
    spec = importlib.util.spec_from_file_location("ref_clean", REFERENCE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ref = load_reference()
    y, G, W, K = oracle.simulate(n=N, p=P, c=C, seed=SEED)
    ev, U = np.linalg.eigh(K)
    ev = np.maximum(ev, 0.0)
    Wr, yr, Xr = U.T @ W, U.T @ y, U.T @ G
    n, c = Wr.shape
    I = np.eye(n)

    rows = []
    for g in range(Xr.shape[1]):
        xg = Xr[:, g]
        V = np.c_[Wr, xg]
        liks = [ref.likelihood_restricted_lambda(l, ev, I, yr, V)
                for l in GRID]
        lam = float(GRID[int(np.argmax(liks))])
        beta, se, tau = ref.calc_beta_vg_ve_restricted(ev, I, Wr, xg, lam, yr)
        F = (beta / se) ** 2
        # production p-value formula (reference lmm/lmm.py:482)
        p = float(stats.f.sf(F, 1, n - c - 1))
        rows.append((g, lam, beta, se, tau, F, p))

    with open(GOLDEN, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(
            ["snp", "lambda_grid", "beta", "se_beta", "tau", "F_wald",
             "p_wald"]
        )
        for r in rows:
            w.writerow([r[0]] + [f"{v:.17g}" for v in r[1:]])
    print(f"wrote {GOLDEN} ({len(rows)} SNPs)")


if __name__ == "__main__":
    main()
