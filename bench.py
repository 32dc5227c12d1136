"""Benchmark: REML-Wald LMM association throughput on the default device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "SNPs/s", "vs_baseline": N}

``value`` is SNPs/sec for the full per-SNP REML pipeline (rotation of the
genotype block into the eigenbasis + lambda grid/bisection/Newton solve +
Wald statistics) on synthetic data shaped like the reference's UKB benchmark
tier (experiments/benchmarks/benchmarks.py:110-149).  ``vs_baseline`` is the
ratio against a single-core CPU implementation of the reference pyGEMMA
algorithm (baselines/cpu_pygemma.py) timed on a subset of the same problem
on this host.

Environment knobs: PYGEMMA_BENCH_N, PYGEMMA_BENCH_P, PYGEMMA_BENCH_C,
PYGEMMA_BENCH_BASELINE_SNPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("PYGEMMA_BENCH_N", 10_000))
    p = int(os.environ.get("PYGEMMA_BENCH_P", 16_384))
    c = int(os.environ.get("PYGEMMA_BENCH_C", 3))
    base_snps = int(os.environ.get("PYGEMMA_BENCH_BASELINE_SNPS", 48))

    import jax
    import jax.numpy as jnp

    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.assoc import assoc_block
    from pygemma_tpu.core.eigen import auto_eigendecompose

    dev = jax.devices()[0]
    log(f"device: {dev} | n={n} p={p} c={c}")

    rng = np.random.default_rng(0)
    G = rng.binomial(2, 0.3, size=(n, p)).astype(np.float32)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    W = np.c_[np.ones(n), rng.normal(size=(n, c - 1))].astype(np.float32)
    y = (0.25 * G[:, : p // 50].sum(1) / max(1, p // 50) ** 0.5
         + rng.normal(size=n)).astype(np.float32)

    # One-time eigendecomposition stage (reported but not in the headline
    # rate; cached on disk since the synthetic dataset is deterministic).
    # Everything stays host-side here: the tunnel's device->host path is slow
    # (~MB/s) on this setup, so K is built with host BLAS instead of pulling
    # a device K back.
    t0 = time.time()
    G_dev = jnp.asarray(G)
    G_dev.block_until_ready()
    log(f"genotype transfer to device: {time.time()-t0:.2f}s")
    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache", f"eigh_n{n}_p{p}.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            ev_h, U_h = z["ev"], z["U"]
        log("eigh: loaded from cache")
    else:
        K_h = (G @ G.T) / p + 1e-3 * np.eye(n, dtype=np.float32)
        log(f"host kinship: {time.time()-t0:.2f}s")
        ev_d, U_d = auto_eigendecompose(K_h, "host", np.float32)
        ev_h, U_h = np.asarray(ev_d), np.asarray(U_d)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, ev=ev_h, U=U_h)
    U = jax.device_put(U_h, dev)
    ev = jax.device_put(ev_h, dev)
    ev.block_until_ready()
    t_eigh = time.time() - t0
    log(f"eigh ready: {t_eigh:.2f}s")

    cfg = GwasConfig(snp_block=int(os.environ.get("PYGEMMA_BENCH_BLOCK", 4096)))
    B = cfg.snp_block

    rot = jax.jit(lambda U, X: jnp.dot(
        U.T, X, precision=jax.lax.Precision.HIGH))

    @jax.jit
    def step(ev, W_r, y_r, xr):
        res = assoc_block(ev, W_r, y_r, xr, cfg)
        return res.beta, res.se_beta, res.tau, res.lam, res.F_wald

    W_r = rot(U, jnp.asarray(W))
    y_r = rot(U, jnp.asarray(y)[:, None])[:, 0]

    fin = jax.jit(lambda b: jnp.isfinite(b).sum())

    def scan_once():
        # Fully async dispatch: a device->host synchronization through the
        # tunnel costs ~34 ms, so reduce per-block results on device and pull
        # ONE scalar at the end.
        Xr = rot(U, G_dev)  # rotation: one full GEMM
        counts = []
        for s in range(0, p, B):
            out = step(ev, W_r, y_r, jax.lax.dynamic_slice_in_dim(Xr, s, B, 1))
            counts.append(fin(out[0]))
        return int(sum(int(c) for c in jax.device_get(counts)))

    # warmup pass: compiles every shape and absorbs the one-time
    # first-materialization penalty tunneled backends charge per executable
    t0 = time.time()
    nfin = scan_once()
    log(f"warmup pass (compiles included): {time.time()-t0:.2f}s")

    t0 = time.time()
    nfin = scan_once()
    t_scan = time.time() - t0
    tpu_rate = p / t_scan
    log(f"scan: {t_scan:.2f}s -> {tpu_rate:.1f} SNPs/s (finite beta: {nfin}/{p})")

    # --- CPU single-core baseline on a subset --------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from baselines.cpu_pygemma import run_gwas as cpu_run

    ev_h2 = np.asarray(ev, np.float64)
    W_h = np.asarray(W_r, np.float64)
    y_h2 = np.asarray(y_r, np.float64)
    X_h = (U_h.T @ G[:, :base_snps]).astype(np.float64)
    t0 = time.time()
    cpu_out = cpu_run(ev_h2, W_h, y_h2, X_h)
    t_cpu = time.time() - t0
    cpu_rate = base_snps / t_cpu
    log(f"cpu baseline: {base_snps} SNPs in {t_cpu:.2f}s -> {cpu_rate:.2f} SNPs/s")

    # sanity: results agree on the subset
    tpu_beta = np.asarray(step(ev, W_r, y_r, rot(U, G_dev[:, :B]))[0])[:base_snps]
    rel = np.nanmedian(
        np.abs(tpu_beta - cpu_out["beta"]) / np.maximum(np.abs(cpu_out["beta"]), 1e-8)
    )
    log(f"median |beta rel diff| vs baseline: {rel:.2e}")

    print(json.dumps({
        "metric": f"reml_wald_snps_per_sec_n{n}",
        "value": round(tpu_rate, 2),
        "unit": "SNPs/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
