"""Benchmark: REML-Wald LMM association throughput on the default device.

Prints ONE JSON line (last line of stdout), e.g.:
  {"metric": ..., "value": N, "unit": "SNPs/s", "vs_baseline": N,
   "eigh_seconds": E, "scan_seconds": S, ...}

Two modes (PYGEMMA_BENCH_MODE):

* "large" (default): the reference's big-GWAS design point
  (experiments/large_gwas/run_pygemma.sh, matrix_reader.cpp streaming) --
  n=20,000 samples x 100,000 SNPs streamed from an on-disk memmap rawbin
  file through ``SnpBlockStreamer`` into the public ``pygemma()`` driver
  with ``run_dir`` checkpointing.  The O(n^3) eigendecomposition wall time
  is ALWAYS reported: measured fresh on the first run and replayed from the
  cache record afterwards (``eigh_cached`` says which).
* "standard": the round-1 single-block-loop scan (n=10,000 x 16,384) for
  continuity with BENCH_r01.

``vs_baseline`` is the ratio against a single-core CPU implementation of
the reference pyGEMMA algorithm (baselines/cpu_pygemma.py) timed on a
subset of the same problem on this host.

Environment knobs: PYGEMMA_BENCH_MODE, PYGEMMA_BENCH_N, PYGEMMA_BENCH_P,
PYGEMMA_BENCH_C, PYGEMMA_BENCH_BLOCK, PYGEMMA_BENCH_BASELINE_SNPS,
PYGEMMA_BENCH_KINSHIP_SNPS.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _gen_geno_memmap(n: int, p: int, block: int = 8192):
    """Synthetic genotypes as an on-disk int8 dosage memmap with per-column
    standardization sidecar (io/quantized.py): 1/4 the bytes of float32 on
    disk AND over the host->device tunnel; dequantized to the identical
    standardized float32 on device."""
    from pygemma_tpu.io.quantized import QuantizedMatrix

    prefix = os.path.join(CACHE, f"geno_n{n}_p{p}")
    if not (os.path.exists(prefix + ".i8")
            and os.path.exists(prefix + ".scale.npz")):
        os.makedirs(CACHE, exist_ok=True)
        log(f"writing int8 memmap genotypes {n}x{p} ...")
        t0 = time.time()
        mu = np.empty(p, np.float32)
        sd = np.empty(p, np.float32)
        with open(prefix + ".i8", "wb") as f:
            rng = np.random.default_rng(0)
            for s in range(0, p, block):
                b = min(block, p - s)
                # 3-level dosages, (p, n) on disk so logical column blocks
                # are contiguous reads
                Gb = rng.binomial(2, 0.3, size=(b, n)).astype(np.int8)
                xf = Gb.astype(np.float32)
                mu[s:s + b] = xf.mean(1)
                sd[s:s + b] = np.maximum(xf.std(1), 1e-6)
                f.write(Gb.tobytes())
        with open(prefix + ".dim", "w") as f:
            f.write(f"{p} {n}\n")
        np.savez(prefix + ".scale.npz", mu=mu, sd=sd)
        log(f"genotype file written in {time.time()-t0:.1f}s "
            f"({os.path.getsize(prefix + '.i8') / 2**30:.1f} GiB)")
    return QuantizedMatrix.open_rawbin(prefix)


def _eigh_cached(K_builder, n: int, tag: str, dtype=np.float32,
                 keep_K: bool = False):
    """Host eigendecomposition with measured wall time persisted alongside
    the result, so cache replays still report the true O(n^3) cost."""
    from pygemma_tpu.core.eigen import host_eigendecompose

    path = os.path.join(CACHE, f"eigh_{tag}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            K = z["K"] if keep_K and "K" in z.files else None
            return z["ev"], z["U"], K, float(z["seconds"]), True
    K = K_builder()
    t0 = time.time()
    ev, U = host_eigendecompose(K, dtype)
    secs = time.time() - t0
    os.makedirs(CACHE, exist_ok=True)
    extra = {"K": K} if keep_K else {}
    np.savez(path, ev=ev, U=U, seconds=secs, **extra)
    return ev, U, (K if keep_K else None), secs, False


def _cpu_baseline(ev, W_r, y_r, X_r_subset):
    from baselines.cpu_pygemma import run_gwas as cpu_run

    t0 = time.time()
    out = cpu_run(np.asarray(ev, np.float64), np.asarray(W_r, np.float64),
                  np.asarray(y_r, np.float64),
                  np.asarray(X_r_subset, np.float64))
    t_cpu = time.time() - t0
    return out, X_r_subset.shape[1] / t_cpu


def bench_large():
    """Streamed big-n scan through the public driver."""
    n = int(os.environ.get("PYGEMMA_BENCH_N", 20_000))
    p = int(os.environ.get("PYGEMMA_BENCH_P", 100_000))
    c = int(os.environ.get("PYGEMMA_BENCH_C", 3))
    block = int(os.environ.get("PYGEMMA_BENCH_BLOCK", 8192))
    k_snps = int(os.environ.get("PYGEMMA_BENCH_KINSHIP_SNPS", 16_384))
    base_snps = int(os.environ.get("PYGEMMA_BENCH_BASELINE_SNPS", 16))

    import jax

    from pygemma_tpu.api import _kinship_fingerprint, pygemma
    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.io.kinship import kinship_blocked
    from pygemma_tpu.utils.checkpoint import RunCheckpoint

    dev = jax.devices()[0]
    log(f"device: {dev} | LARGE streamed n={n} p={p} block={block}")

    X = _gen_geno_memmap(n, p)  # (n, p) float32 memmap view
    rng = np.random.default_rng(1)
    W = np.c_[np.ones(n), rng.standard_normal((n, c - 1))].astype(np.float32)
    y = (0.25 * np.asarray(X[:, :64]).mean(1) * 8.0
         + rng.standard_normal(n)).astype(np.float32)

    # GRM from a SNP subset (standard practice; keeps the host kinship
    # build off the 2-core critical path), then the honest host eigh.
    def build_K():
        log(f"building kinship from {k_snps} SNPs on device ...")
        t0 = time.time()
        K = kinship_blocked(np.asarray(X[:, :k_snps]), block=8192)
        K = K + (1e-3 * np.eye(n, dtype=np.float32))
        log(f"kinship: {time.time()-t0:.1f}s")
        return K

    ev, U, K, eigh_secs, eigh_cached = _eigh_cached(
        build_K, n, f"large_n{n}_k{k_snps}", keep_K=True)
    log(f"eigh (host LAPACK, n={n}): {eigh_secs:.1f}s "
        f"{'[cached result]' if eigh_cached else '[measured now]'}")

    # Pre-seed the run_dir with the eigendecomposition under the driver's
    # own cache key, then scan via the PUBLIC driver: memmap genotypes ->
    # SnpBlockStreamer double-buffered host->device blocks -> per-block
    # checkpointed results.
    cfg = GwasConfig(snp_block=block)
    run_dir = os.path.join(CACHE, f"run_n{n}_p{p}")
    if os.path.isdir(run_dir):
        for f in os.listdir(run_dir):  # fresh scan every time
            os.remove(os.path.join(run_dir, f))
    ckpt = RunCheckpoint(run_dir)
    ckpt.save_eigen(ev, U, f"{_kinship_fingerprint(K)}|{cfg.dtype}")

    # warmup: compile the rotation + association executables at the real
    # shapes (remote compiles are expensive, and each new executable's first
    # host materialization pays a one-time penalty through the tunnel)
    t0 = time.time()
    import jax.numpy as jnp

    from pygemma_tpu.core.eigen import rotate

    U_dev = jnp.asarray(U)
    rotate(U_dev, jnp.asarray(W)).block_until_ready()
    rotate(U_dev, jnp.asarray(y[:, None])).block_until_ready()
    rotate(U_dev, jnp.asarray(np.asarray(X[:, :block]))).block_until_ready()
    pygemma(y, np.asarray(X[:, :block]), W, ev, eigen=False, config=cfg)
    # warm the int8 dequantization executable at the streamed block shape
    from pygemma_tpu.io.streaming import SnpBlockStreamer

    next(iter(SnpBlockStreamer(X, block)))[2].block_until_ready()
    del U_dev
    log(f"warmup (compiles included): {time.time()-t0:.1f}s")

    t0 = time.time()
    df = pygemma(y, X, W, K, config=cfg, run_dir=run_dir)
    scan_secs = time.time() - t0
    rate = p / scan_secs
    nfin = int(np.isfinite(df["p_wald"]).sum())
    log(f"streamed scan: {scan_secs:.1f}s -> {rate:.1f} SNPs/s "
        f"(finite p: {nfin}/{p})")

    # single-core CPU baseline on a subset at the same n
    Xr_sub = (U.T @ np.asarray(X[:, :base_snps])).astype(np.float64)
    cpu_out, cpu_rate = _cpu_baseline(ev, U.T @ W, U.T @ y, Xr_sub)
    log(f"cpu baseline: {cpu_rate:.2f} SNPs/s")
    rel = np.nanmedian(np.abs(np.asarray(df["beta"][:base_snps])
                              - cpu_out["beta"])
                       / np.maximum(np.abs(cpu_out["beta"]), 1e-8))
    log(f"median |beta rel diff| vs baseline: {rel:.2e}")

    print(json.dumps({
        "metric": f"reml_wald_snps_per_sec_n{n}_p{p}_streamed",
        "value": round(rate, 2),
        "unit": "SNPs/s",
        "vs_baseline": round(rate / cpu_rate, 2),
        "eigh_seconds": round(eigh_secs, 2),
        "eigh_cached": bool(eigh_cached),
        "scan_seconds": round(scan_secs, 2),
        "end_to_end_seconds": round(scan_secs + eigh_secs, 2),
    }))


def bench_standard():
    n = int(os.environ.get("PYGEMMA_BENCH_N", 10_000))
    p = int(os.environ.get("PYGEMMA_BENCH_P", 16_384))
    c = int(os.environ.get("PYGEMMA_BENCH_C", 3))
    base_snps = int(os.environ.get("PYGEMMA_BENCH_BASELINE_SNPS", 48))

    import jax
    import jax.numpy as jnp

    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.assoc import assoc_block

    dev = jax.devices()[0]
    log(f"device: {dev} | n={n} p={p} c={c}")

    rng = np.random.default_rng(0)
    G = rng.binomial(2, 0.3, size=(n, p)).astype(np.float32)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    W = np.c_[np.ones(n), rng.normal(size=(n, c - 1))].astype(np.float32)
    y = (0.25 * G[:, : p // 50].sum(1) / max(1, p // 50) ** 0.5
         + rng.normal(size=n)).astype(np.float32)

    t0 = time.time()
    G_dev = jnp.asarray(G)
    G_dev.block_until_ready()
    log(f"genotype transfer to device: {time.time()-t0:.2f}s")

    def build_K():
        return (G @ G.T) / p + 1e-3 * np.eye(n, dtype=np.float32)

    ev_h, U_h, _, eigh_secs, eigh_cached = _eigh_cached(
        build_K, n, f"std_n{n}_p{p}")
    log(f"eigh (host, n={n}): {eigh_secs:.1f}s "
        f"{'[cached result]' if eigh_cached else '[measured now]'}")
    U = jax.device_put(U_h, dev)
    ev = jax.device_put(ev_h, dev)
    ev.block_until_ready()

    cfg = GwasConfig(snp_block=int(os.environ.get("PYGEMMA_BENCH_BLOCK",
                                                  4096)))
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
        # tunnel costs ~34 ms, so reduce per-block results on device and
        # pull ONE scalar at the end.
        Xr = rot(U, G_dev)  # rotation: one full GEMM
        counts = []
        for s in range(0, p, B):
            out = step(ev, W_r, y_r,
                       jax.lax.dynamic_slice_in_dim(Xr, s, B, 1))
            counts.append(fin(out[0]))
        return int(sum(int(cc) for cc in jax.device_get(counts)))

    t0 = time.time()
    nfin = scan_once()
    log(f"warmup pass (compiles included): {time.time()-t0:.2f}s")

    t0 = time.time()
    nfin = scan_once()
    t_scan = time.time() - t0
    tpu_rate = p / t_scan
    log(f"scan: {t_scan:.2f}s -> {tpu_rate:.1f} SNPs/s "
        f"(finite beta: {nfin}/{p})")

    Xr_sub = (U_h.T @ G[:, :base_snps]).astype(np.float64)
    cpu_out, cpu_rate = _cpu_baseline(ev_h, np.asarray(W_r), np.asarray(y_r),
                                      Xr_sub)
    log(f"cpu baseline: {cpu_rate:.2f} SNPs/s")

    tpu_beta = np.asarray(
        step(ev, W_r, y_r, rot(U, G_dev[:, :B]))[0])[:base_snps]
    rel = np.nanmedian(
        np.abs(tpu_beta - cpu_out["beta"])
        / np.maximum(np.abs(cpu_out["beta"]), 1e-8)
    )
    log(f"median |beta rel diff| vs baseline: {rel:.2e}")

    print(json.dumps({
        "metric": f"reml_wald_snps_per_sec_n{n}",
        "value": round(tpu_rate, 2),
        "unit": "SNPs/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
        "eigh_seconds": round(eigh_secs, 2),
        "eigh_cached": bool(eigh_cached),
        "scan_seconds": round(t_scan, 2),
    }))


def main():
    if os.environ.get("PYGEMMA_BENCH_CPU"):
        # smoke-test knob: the axon TPU plugin overrides JAX_PLATFORMS at
        # register time, so pin CPU via the config API after import
        import jax

        jax.config.update("jax_platforms", "cpu")
    from pygemma_tpu.api import _enable_compile_cache

    _enable_compile_cache()
    mode = os.environ.get("PYGEMMA_BENCH_MODE", "large")
    if mode == "large":
        bench_large()
    else:
        bench_standard()


if __name__ == "__main__":
    main()
