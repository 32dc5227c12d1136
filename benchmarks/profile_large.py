"""Stage-instrumented replay of the BENCH large-mode timed region.

Reuses .bench_cache artifacts (eigh npz + int8 genotype memmap) and walks
the exact ``pygemma(..., run_dir=...)`` code path by hand, timestamping
every sub-stage, to locate where the scan wall-clock goes on the tunneled
TPU backend.  Diagnostic only -- not part of the library.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".bench_cache")
sys.path.insert(0, REPO)

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.2f}s] {msg}", file=sys.stderr, flush=True)


def main():
    n, p, block, k_snps = 20_000, 100_000, 8192, 16_384
    import jax
    import jax.numpy as jnp

    from pygemma_tpu.api import _assoc_block_jit, _enable_compile_cache
    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.eigen import rotate
    from pygemma_tpu.io.quantized import QuantizedMatrix
    from pygemma_tpu.io.streaming import SnpBlockStreamer

    _enable_compile_cache()
    cfg = GwasConfig(snp_block=block)
    dev = jax.devices()[0]
    log(f"device {dev}")

    X = QuantizedMatrix.open_rawbin(os.path.join(CACHE, f"geno_n{n}_p{p}"))
    rng = np.random.default_rng(1)
    W = np.c_[np.ones(n), rng.standard_normal((n, 2))].astype(np.float32)
    y = (0.25 * np.asarray(X[:, :64]).mean(1) * 8.0
         + rng.standard_normal(n)).astype(np.float32)

    t = time.time()
    with np.load(os.path.join(CACHE, f"eigh_large_n{n}_k{k_snps}.npz")) as z:
        ev_h, U_h = z["ev"], z["U"]
    log(f"load eigh npz from disk: {time.time()-t:.2f}s")

    t = time.time()
    ev_dev = jnp.asarray(ev_h)
    U_dev = jnp.asarray(U_h)
    jax.block_until_ready(U_dev)
    log(f"ev/U host->device dispatch: {time.time()-t:.2f}s")

    t = time.time()
    W_dev = rotate(U_dev, jnp.asarray(W))
    y_dev = rotate(U_dev, jnp.asarray(y[:, None]))[:, 0]
    log(f"rotate W,y dispatch: {time.time()-t:.2f}s")

    # force everything so far to really finish: pull a scalar
    t = time.time()
    float(jnp.sum(y_dev))
    log(f"sync (U transfer + W/y rotate complete): {time.time()-t:.2f}s")

    # --- warm the executables at the real shapes -------------------------
    t = time.time()
    it = iter(SnpBlockStreamer(X, block))
    s0, e0, xb0 = next(it)
    it.close()
    log(f"warm: first streamed block fetched (dispatch): {time.time()-t:.2f}s")
    t = time.time()
    xr0 = rotate(U_dev, xb0)
    stacked0 = _assoc_block_jit(ev_dev, W_dev, y_dev, xr0, cfg, None, False)
    h = np.asarray(stacked0)
    log(f"warm: rotate+assoc compile + first materialization: {time.time()-t:.2f}s")
    t = time.time()
    h = np.asarray(_assoc_block_jit(ev_dev, W_dev, y_dev,
                                    rotate(U_dev, xb0), cfg, None, False))
    log(f"warm2: steady-state single block (reused input): {time.time()-t:.2f}s")

    # --- the timed scan, stage by stage ----------------------------------
    stats = {"fetch_wait": 0.0, "dispatch": 0.0, "pull": 0.0, "save": 0.0}
    t_scan = time.time()
    stream = iter(SnpBlockStreamer(X, block))
    nfin = 0
    for bi in range(0, p, block):
        t = time.time()
        start, stop, xb = next(stream)
        stats["fetch_wait"] += time.time() - t
        t = time.time()
        xr = rotate(U_dev, xb)
        stacked = _assoc_block_jit(ev_dev, W_dev, y_dev, xr, cfg, None, False)
        stats["dispatch"] += time.time() - t
        t = time.time()
        hostblk = np.asarray(stacked)
        stats["pull"] += time.time() - t
        t = time.time()
        np.savez(f"/tmp/profblk_{start}.npz",
                 **{f"k{i}": hostblk[i] for i in range(hostblk.shape[0])})
        stats["save"] += time.time() - t
        nfin += int(np.isfinite(hostblk[0]).sum())
    total = time.time() - t_scan
    log(f"scan total: {total:.2f}s ({p/total:.0f} SNPs/s), finite {nfin}")
    for k, v in stats.items():
        log(f"  {k:12s} {v:8.2f}s")
    log(f"  unaccounted {total - sum(stats.values()):8.2f}s")

    # deferred-pull variant: dispatch all blocks, pull at the end
    t_scan = time.time()
    stream = iter(SnpBlockStreamer(X, block))
    pend = []
    tf = td = 0.0
    for bi in range(0, p, block):
        t = time.time()
        start, stop, xb = next(stream)
        tf += time.time() - t
        t = time.time()
        pend.append(_assoc_block_jit(ev_dev, W_dev, y_dev,
                                     rotate(U_dev, xb), cfg, None, False))
        td += time.time() - t
    t = time.time()
    outs = [np.asarray(s) for s in pend]
    tp = time.time() - t
    total = time.time() - t_scan
    log(f"deferred scan total: {total:.2f}s ({p/total:.0f} SNPs/s)  "
        f"fetch {tf:.2f}s dispatch {td:.2f}s pull {tp:.2f}s")


if __name__ == "__main__":
    main()
