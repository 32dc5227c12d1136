"""Aggregate benchmark CSVs and plot runtime / speedup curves.

Reference equivalents: tests/combine_benchmarks.py:17-29 (per-job CSV
concat + runtime/speedup line plots) and
experiments/benchmarks/combine_benchmarks.py:71-75 (core-hour accounting).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np
import pandas as pd


def combine(paths):
    frames = []
    for pat in paths:
        for f in glob.glob(pat):
            frames.append(pd.read_csv(f))
    df = pd.concat(frames, ignore_index=True)
    agg = (
        df.groupby(["sample_size", "num_snps", "num_covars"])
        .agg(
            tpu_time_median=("pygemma_tpu_time", "median"),
            tpu_snps_per_sec=("pygemma_tpu_snps_per_sec", "median"),
            speedup_median=("speedup_vs_cpu_core", "median"),
            reps=("rep", "count"),
        )
        .reset_index()
    )
    # chip-hour accounting (reference core-hours,
    # experiments/benchmarks/combine_benchmarks.py:71-75)
    agg["chip_hours"] = agg["tpu_time_median"] / 3600.0
    return df, agg


def plot(agg, out_prefix, x="sample_size"):
    """Runtime and speedup curves along ``x`` (sample_size for the
    reference's n-scaling plots, num_covars for the covariate-scaling
    result of README.md:125-144)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    others = [c for c in ("sample_size", "num_snps", "num_covars") if c != x]
    labels = {"sample_size": "n", "num_snps": "p", "num_covars": "c"}
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for key, sub in agg.groupby(others):
        lab = ", ".join(f"{labels[o]}={k}" for o, k in zip(others, key))
        axes[0].plot(sub[x], sub["tpu_time_median"], "o-", label=lab)
        axes[1].plot(sub[x], sub["speedup_median"], "o-", label=lab)
    axes[0].set_xlabel(labels[x])
    axes[0].set_ylabel("runtime (s)")
    axes[0].set_yscale("log")
    axes[1].set_xlabel(labels[x])
    axes[1].set_ylabel("speedup vs 1 CPU core")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_prefix + "_curves.png", dpi=150)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+", help="results CSVs / globs")
    ap.add_argument("--out-prefix", default="benchmark")
    ap.add_argument("--x", default="sample_size",
                    choices=("sample_size", "num_snps", "num_covars"))
    args = ap.parse_args()
    df, agg = combine(args.inputs)
    agg.to_csv(args.out_prefix + "_summary.csv", index=False)
    print(agg.to_string(index=False))
    try:
        plot(agg, args.out_prefix, x=args.x)
    except Exception as e:  # plotting is best-effort
        print(f"(plots skipped: {e})")


if __name__ == "__main__":
    main()
