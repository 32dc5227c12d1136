"""Benchmark grid runner: sample_size x num_snps x num_covars x reps.

Reproduces the reference's benchmark harness semantics
(tests/benchmark_pygemma.py:303-344 grid + CSV appends;
experiments/benchmarks/benchmarks.py:110-149 UKB grid): every config is
timed for the TPU engine and the single-core CPU baseline, rows are appended
to ``results.csv`` as they finish (crash loses only the current config), and
the grid can be sharded across workers with TASK_ID/TASK_COUNT env vars
(the reference's SLURM_ARRAY_TASK_ID pattern,
tests/benchmark_pygemma.py:329-336).

Usage:
    python benchmarks/run_grid.py --out results.csv \
        --samples 500,1000,2000 --snps 1000,5000 --covars 0,5 --reps 2
"""

from __future__ import annotations

import argparse
import csv
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_rival(fn, *args, **kw):
    """(seconds, ok) with the reference's NaN-on-failure semantics
    (benchmarks.py:281-343 wraps every rival in try/except -> NaN)."""
    t0 = time.time()
    try:
        out = fn(*args, **kw)
        if out is None:  # binary not installed -> skip, not fail
            return np.nan, "absent"
        return round(time.time() - t0, 4), "ok"
    except Exception as e:
        print(f"rival {fn.__name__} failed: {e}", file=sys.stderr)
        return np.nan, "error"


def run_config(n, p, c, rep, include_cpu=True, cpu_snps=32, rivals=False,
               warmup=False):
    from baselines.cpu_pygemma import run_gwas as cpu_run
    from pygemma_tpu import GwasConfig, pygemma
    from pygemma_tpu.sim import simulate_gwas

    d = simulate_gwas(n=n, p=p, c=max(c, 1), seed=1000 * rep + n + p + c)
    W = d.W if c > 0 else None

    if warmup:
        # absorb per-shape XLA compiles + first-materialization tunnel
        # costs so the timed call measures steady-state throughput (the
        # reference's timing likewise excludes Python import/JIT overheads)
        pygemma(d.Y, d.X, W, d.K, config=GwasConfig())

    t0 = time.time()
    df = pygemma(d.Y, d.X, W, d.K, config=GwasConfig())
    t_tpu = time.time() - t0

    t_cpu_per_snp = np.nan
    if include_cpu:
        ev, U = np.linalg.eigh(d.K.astype(np.float64))
        ev = np.maximum(ev, 0)
        Wn = W if W is not None else np.ones((n, 1))
        sub = min(cpu_snps, p)
        t0 = time.time()
        cpu_run(ev, U.T @ Wn.astype(np.float64), U.T @ d.Y.astype(np.float64),
                (U.T @ d.X[:, :sub].astype(np.float64)))
        t_cpu_per_snp = (time.time() - t0) / sub

    row = {
        "sample_size": n,
        "num_snps": p,
        "num_covars": c,
        "rep": rep,
        "pygemma_tpu_time": round(t_tpu, 4),
        "pygemma_tpu_snps_per_sec": round(p / t_tpu, 2),
        "cpu_baseline_time_extrapolated": round(t_cpu_per_snp * p, 4),
        "speedup_vs_cpu_core": round(t_cpu_per_snp * p / t_tpu, 2),
        "frac_finite_p": round(float(np.isfinite(df["p_wald"]).mean()), 4),
    }
    if rivals:
        # the reference's rival-comparison table (GEMMA / GCTA-mlma /
        # fastGWA / Regenie timed over the same subsampled cohort,
        # experiments/benchmarks/subsample.R:90-126, benchmarks.py:177-228)
        from pygemma_tpu import compare

        for name, fn, args in (
            ("gemma", compare.run_gemma, (d.Y, d.X, W, d.K)),
            ("gcta_mlma", compare.run_gcta, (d.Y, d.X, W, d.K)),
            ("fastgwa", compare.run_fastgwa, (d.Y, d.X, W, d.K)),
            ("regenie", compare.run_regenie, (d.Y, d.X, W)),
        ):
            secs, status = _time_rival(fn, *args)
            row[f"{name}_time"] = secs
            row[f"{name}_status"] = status
            row[f"speedup_vs_{name}"] = (
                round(secs / t_tpu, 2) if np.isfinite(secs) else np.nan)
    return row


def main():
    if os.environ.get("PYGEMMA_BENCH_CPU"):
        # the axon TPU plugin overrides JAX_PLATFORMS at register time;
        # pin CPU via the config API after import (see bench.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results.csv")
    ap.add_argument("--samples", default="200,500,1000")
    ap.add_argument("--snps", default="500,2000")
    ap.add_argument("--covars", default="0,3")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-cpu", action="store_true")
    ap.add_argument("--rivals", action="store_true",
                    help="also time GEMMA/GCTA/fastGWA/Regenie when their "
                         "binaries exist (NaN + status column otherwise)")
    ap.add_argument("--warmup", action="store_true",
                    help="run each config once untimed first (excludes "
                         "XLA compile + tunnel first-call costs)")
    args = ap.parse_args()

    grid = list(itertools.product(
        [int(x) for x in args.samples.split(",")],
        [int(x) for x in args.snps.split(",")],
        [int(x) for x in args.covars.split(",")],
        range(args.reps),
    ))
    # worker sharding (reference SLURM-array pattern)
    task_id = int(os.environ.get("TASK_ID", os.environ.get("SLURM_ARRAY_TASK_ID", 0)))
    task_count = int(os.environ.get("TASK_COUNT", os.environ.get("SLURM_ARRAY_TASK_COUNT", 1)))
    grid = grid[task_id::task_count]

    write_header = not os.path.exists(args.out)
    for n, p, c, rep in grid:
        try:
            row = run_config(n, p, c, rep, include_cpu=not args.no_cpu,
                             rivals=args.rivals, warmup=args.warmup)
        except Exception as e:  # NaN row, run continues (reference
            # benchmarks.py:281-343 wraps rivals the same way)
            print(f"config ({n},{p},{c},{rep}) failed: {e}", file=sys.stderr)
            row = {"sample_size": n, "num_snps": p, "num_covars": c,
                   "rep": rep, "pygemma_tpu_time": np.nan,
                   "pygemma_tpu_snps_per_sec": np.nan,
                   "cpu_baseline_time_extrapolated": np.nan,
                   "speedup_vs_cpu_core": np.nan, "frac_finite_p": np.nan}
        with open(args.out, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if write_header:
                w.writeheader()
                write_header = False
            w.writerow(row)
        print(row, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
