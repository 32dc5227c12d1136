"""Benchmark: REML-Wald LMM association throughput on the default device.

Prints ONE JSON line (last line of stdout), e.g.:
  {"metric": ..., "value": N, "unit": "SNPs/s", "vs_baseline": N,
   "eigh_seconds": E, "scan_seconds": S, ...}

Two modes (PYGEMMA_BENCH_MODE):

* "large" (default): the reference's big-GWAS design point
  (experiments/large_gwas/run_pygemma.sh, matrix_reader.cpp streaming) --
  n=20,000 samples x 100,000 SNPs streamed from an on-disk 2-bit packed
  memmap (PLINK .bed density; 16x less host->device tunnel traffic than
  float32, io/packed.py) through the public ``pygemma()`` driver with
  ``run_dir`` checkpointing.  The kinship is the standard GRM-from-SNP-
  subset K = GG'/p_k + eps*I, eigendecomposed EXACTLY via the low-rank
  path (core/lowrank.py): p_k x p_k Gram eigh + device GEMMs -- no O(n^3)
  dense eigh and no n x n eigenbasis upload.  eigh is timed fresh every
  run and reported in ``eigh_seconds``.
* "standard": the round-1 single-block-loop scan (n=10,000 x 16,384) for
  continuity with BENCH_r01.

``vs_baseline`` is the ratio against a single-core CPU implementation of
the reference pyGEMMA algorithm (baselines/cpu_pygemma.py) timed on a
subset of the same problem on this host.

Environment knobs: PYGEMMA_BENCH_MODE, PYGEMMA_BENCH_N, PYGEMMA_BENCH_P,
PYGEMMA_BENCH_C, PYGEMMA_BENCH_BLOCK, PYGEMMA_BENCH_BASELINE_SNPS,
PYGEMMA_BENCH_KINSHIP_SNPS, PYGEMMA_BENCH_MESH_SMOKE.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cache")
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _gen_geno_packed(n: int, p: int, block: int = 8192):
    """Synthetic genotypes as an on-disk 2-bit packed memmap with a
    per-column standardization sidecar (io/packed.py): PLINK-bed density on
    disk AND over the host->device tunnel; unpacked + dequantized on device
    to the identical standardized float32."""
    from pygemma_tpu.io.packed import PackedMatrix, pack_codes

    prefix = os.path.join(CACHE, f"geno_n{n}_p{p}")
    if not (os.path.exists(prefix + ".2b")
            and os.path.exists(prefix + ".scale.npz")):
        os.makedirs(CACHE, exist_ok=True)
        i8 = prefix + ".i8"
        if os.path.exists(i8) and os.path.exists(prefix + ".scale.npz"):
            # repack an existing int8 cache (saves the slow binomial regen)
            log(f"repacking int8 cache to 2-bit: {n}x{p} ...")
            mm = np.memmap(i8, dtype=np.int8, mode="r", shape=(p, n))
            with open(prefix + ".2b", "wb") as f:
                for s in range(0, p, block):
                    cb = np.asarray(mm[s:s + block]).T.astype(np.uint8)
                    f.write(np.ascontiguousarray(pack_codes(cb).T).tobytes())
        else:
            log(f"writing 2-bit packed genotypes {n}x{p} ...")
            t0 = time.time()
            mu = np.empty(p, np.float32)
            sd = np.empty(p, np.float32)
            rng = np.random.default_rng(0)
            with open(prefix + ".2b", "wb") as f:
                for s in range(0, p, block):
                    b = min(block, p - s)
                    Gb = rng.binomial(2, 0.3, size=(b, n)).astype(np.uint8)
                    xf = Gb.astype(np.float32)
                    mu[s:s + b] = xf.mean(1)
                    sd[s:s + b] = np.maximum(xf.std(1), 1e-6)
                    f.write(np.ascontiguousarray(
                        pack_codes(Gb.T).T).tobytes())
            np.savez(prefix + ".scale.npz", mu=mu, sd=sd)
            log(f"genotype file written in {time.time()-t0:.1f}s "
                f"({os.path.getsize(prefix + '.2b') / 2**30:.2f} GiB)")
        with open(prefix + ".dim", "w") as f:
            f.write(f"{p} {n}\n")
    return PackedMatrix.open_rawbin(prefix)


def _cpu_baseline(ev, W_r, y_r, X_r_subset):
    from baselines.cpu_pygemma import run_gwas as cpu_run

    t0 = time.time()
    out = cpu_run(np.asarray(ev, np.float64), np.asarray(W_r, np.float64),
                  np.asarray(y_r, np.float64),
                  np.asarray(X_r_subset, np.float64))
    t_cpu = time.time() - t0
    return out, X_r_subset.shape[1] / t_cpu


def _wipe_dir(d):
    if os.path.isdir(d):
        shutil.rmtree(d)


def _mesh_smoke(cfg, ev_dev, W_r, y_r, xr_block, stacked_ref):
    """Real-TPU smoke of the fused Pallas kernel under shard_map: a
    1-device mesh runs the sharded association step on hardware (it is
    otherwise only exercised in interpret mode on CPU) and must match the
    single-device block bit-for-bit-ish."""
    import jax

    from pygemma_tpu import api as api_mod
    from pygemma_tpu.parallel.mesh import make_mesh, snp_sharding

    mesh = make_mesh(snp=1)
    from pygemma_tpu.parallel.dist import sharded_assoc_fn

    assoc = sharded_assoc_fn(mesh, cfg,
                             keys=tuple(api_mod._result_keys(cfg)))
    xr_sh = jax.device_put(np.asarray(xr_block),
                           snp_sharding(mesh, cfg.snp_axis))
    got = np.asarray(assoc(ev_dev, W_r, y_r, xr_sh))
    ref = np.asarray(stacked_ref)
    rel = np.nanmax(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-6))
    log(f"mesh(1-device) fused-kernel smoke: max rel diff {rel:.2e}")
    return float(rel)


def bench_large():
    """Streamed big-n scan through the public driver."""
    n = int(os.environ.get("PYGEMMA_BENCH_N", 20_000))
    p = int(os.environ.get("PYGEMMA_BENCH_P", 100_000))
    c = int(os.environ.get("PYGEMMA_BENCH_C", 3))
    block = int(os.environ.get("PYGEMMA_BENCH_BLOCK", 8192))
    k_snps = int(os.environ.get("PYGEMMA_BENCH_KINSHIP_SNPS", 16_384))
    base_snps = int(os.environ.get("PYGEMMA_BENCH_BASELINE_SNPS", 16))
    mesh_smoke = os.environ.get("PYGEMMA_BENCH_MESH_SMOKE", "1") == "1"

    import jax
    import jax.numpy as jnp

    from pygemma_tpu import api as api_mod
    from pygemma_tpu.api import _kinship_fingerprint, pygemma
    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.eigen import rotate
    from pygemma_tpu.core.lowrank import (LowRankKinship,
                                          lowrank_eigendecompose)

    dev = jax.devices()[0]
    log(f"device: {dev} | LARGE streamed n={n} p={p} block={block} "
        f"kinship_snps={k_snps} (low-rank exact eigh)")

    X = _gen_geno_packed(n, p)  # (n, p) 2-bit packed, float32 view
    rng = np.random.default_rng(1)
    W = np.c_[np.ones(n), rng.standard_normal((n, c - 1))].astype(np.float32)
    y = (0.25 * np.asarray(X[:, :64]).mean(1) * 8.0
         + rng.standard_normal(n)).astype(np.float32)

    # GRM from a SNP subset (standard practice), as a symbolic low-rank
    # kinship: K = GG'/p_k + 1e-3 I, never materialized.
    lrk = LowRankKinship(X.cols(0, k_snps), eps=1e-3)

    # --- eigh: timed fresh every run (the honest replacement cost for the
    # reference's O(n^3) dense eigh).  First-ever run pays the XLA compile;
    # the persistent compile cache amortizes it across processes, like any
    # production deployment.
    t0 = time.time()
    ev_dev, U_dev = lowrank_eigendecompose(lrk)
    float(jnp.sum(ev_dev) + jnp.sum(U_dev[0]))  # force completion (tunnel)
    eigh_secs = time.time() - t0
    log(f"low-rank device eigh (n={n}, p_k={k_snps}): {eigh_secs:.1f}s")

    cfg = GwasConfig(snp_block=block)
    eig_key = f"{_kinship_fingerprint(lrk)}|{cfg.dtype}"
    # seed the driver's device-resident eigen cache so neither the warmup
    # nor the timed run recomputes / re-uploads the basis
    api_mod._EIGEN_DEV_CACHE.clear()
    api_mod._EIGEN_DEV_CACHE[eig_key] = (ev_dev, U_dev)

    # --- warmup: run the EXACT timed path (eigen=True kinship, run_dir
    # checkpointing, packed streaming) on a one-block slice so every
    # executable and its first host materialization are warm.
    warm_dir = os.path.join(CACHE, f"run_n{n}_p{p}_warm")
    _wipe_dir(warm_dir)
    t0 = time.time()
    pygemma(y, X.cols(0, block), W, lrk, config=cfg, run_dir=warm_dir)
    log(f"warmup (compiles included): {time.time()-t0:.1f}s")

    # --- the timed streamed scan through the public driver
    run_dir = os.path.join(CACHE, f"run_n{n}_p{p}")
    _wipe_dir(run_dir)
    t0 = time.time()
    df = pygemma(y, X, W, lrk, config=cfg, run_dir=run_dir)
    scan_secs = time.time() - t0
    rate = p / scan_secs
    nfin = int(np.isfinite(df["p_wald"]).sum())
    log(f"streamed scan: {scan_secs:.1f}s -> {rate:.1f} SNPs/s "
        f"(finite p: {nfin}/{p})")

    # single-core CPU baseline on a subset at the same n (rotations done on
    # device; only tiny matrices are pulled)
    W_r = rotate(U_dev, jnp.asarray(W))
    y_r = rotate(U_dev, jnp.asarray(y[:, None]))[:, 0]
    Xr_sub = np.asarray(
        rotate(U_dev, jnp.asarray(np.asarray(X[:, :base_snps]))))
    ev_h = np.asarray(ev_dev)
    cpu_out, cpu_rate = _cpu_baseline(ev_h, np.asarray(W_r),
                                      np.asarray(y_r), Xr_sub)
    log(f"cpu baseline: {cpu_rate:.2f} SNPs/s")
    rel = np.nanmedian(np.abs(np.asarray(df["beta"][:base_snps])
                              - cpu_out["beta"])
                       / np.maximum(np.abs(cpu_out["beta"]), 1e-8))
    log(f"median |beta rel diff| vs baseline: {rel:.2e}")

    mesh_rel = None
    if mesh_smoke:
        try:
            from pygemma_tpu.io.streaming import SnpBlockStreamer

            it = iter(SnpBlockStreamer(X, block))
            xb = next(it)[2]
            it.close()
            xr = rotate(U_dev, xb)
            stacked = api_mod._assoc_block_jit(
                ev_dev, W_r, y_r, xr, cfg, None, False)
            mesh_rel = _mesh_smoke(cfg, ev_dev, W_r, y_r, xr, stacked)
        except Exception as e:  # smoke must never sink the bench
            log(f"mesh smoke failed: {type(e).__name__}: {e}")

    out = {
        "metric": f"reml_wald_snps_per_sec_n{n}_p{p}_streamed",
        "value": round(rate, 2),
        "unit": "SNPs/s",
        "vs_baseline": round(rate / cpu_rate, 2),
        "eigh_seconds": round(eigh_secs, 2),
        "eigh_backend": "lowrank-device",
        "scan_seconds": round(scan_secs, 2),
        "end_to_end_seconds": round(scan_secs + eigh_secs, 2),
    }
    if mesh_rel is not None:
        out["mesh_smoke_rel"] = mesh_rel
    print(json.dumps(out))


def bench_standard():
    n = int(os.environ.get("PYGEMMA_BENCH_N", 10_000))
    p = int(os.environ.get("PYGEMMA_BENCH_P", 16_384))
    c = int(os.environ.get("PYGEMMA_BENCH_C", 3))
    base_snps = int(os.environ.get("PYGEMMA_BENCH_BASELINE_SNPS", 48))

    import jax
    import jax.numpy as jnp

    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.assoc import assoc_block
    from pygemma_tpu.core.lowrank import (LowRankKinship,
                                          lowrank_eigendecompose)

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

    # K = GG'/p + 1e-3 I over ALL p SNPs: p > n, so the exact low-rank
    # route does not apply; use a k_snps=8192 subset GRM like real
    # pipelines (and the "large" mode) do.
    k_snps = min(8192, n - 1, p)
    lrk = LowRankKinship(G[:, :k_snps], eps=1e-3)
    t0 = time.time()
    ev, U = lowrank_eigendecompose(lrk)
    float(jnp.sum(ev) + jnp.sum(U[0]))
    eigh_secs = time.time() - t0
    log(f"low-rank device eigh (n={n}, p_k={k_snps}): {eigh_secs:.1f}s")

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

    Xr_sub = np.asarray(rot(U, G_dev[:, :base_snps]), np.float64)
    cpu_out, cpu_rate = _cpu_baseline(np.asarray(ev), np.asarray(W_r),
                                      np.asarray(y_r), Xr_sub)
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
        "eigh_backend": "lowrank-device",
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
