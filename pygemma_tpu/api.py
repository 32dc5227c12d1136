"""Public driver: ``pygemma(Y, X, W, K, ...) -> pandas.DataFrame``.

API-compatible with the reference driver (``lmm.pygemma``, reference
lmm/lmm.py:87) but executed as jit-compiled scans over SNP blocks on TPU
instead of a multiprocessing pool over column slices (lmm/lmm.py:363-401).

Output schema parity: columns ``beta, se_beta, tau, lambda, F_wald, p_wald``
(+ ``SNPs`` when snp names are given; reference lmm/lmm.py:403-411), extended
with ``p_lrt`` / ``p_score`` / ``logl_H1`` when those tests are requested
(present in GEMMA's own output schema that the reference parses,
experiments/1000G/plot_gemma.py:11, but unimplemented there).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from scipy import stats

from typing import NamedTuple

from .config import GwasConfig, from_env
from .core import assoc as assoc_mod
from .core.assoc import ImplicitCtx, NullFit, assoc_block, fit_null
from .core.eigen import auto_eigendecompose, loading_transform, rotate
from .core.grams import pdot
from .utils.logging import StageLogger

_CACHE_SET = False

#: single-entry device-resident eigendecomposition cache, keyed by the
#: kinship fingerprint.  On tunneled TPU backends re-uploading a 20k x 20k
#: eigenbasis costs ~20 s at ~80 MB/s; repeated ``pygemma`` calls against
#: the same kinship (multi-phenotype studies, warmup-then-measure
#: benchmarks, resumed runs) reuse the on-device (ev, U) instead.  Bounded
#: to one entry so stale eigenbases never accumulate in HBM.
_EIGEN_DEV_CACHE: dict = {}


def _enable_compile_cache() -> None:
    """Persist XLA compilations across processes: the eigh/assoc graphs are
    expensive to compile (remote-compile TPU backends especially) but fully
    shape-cacheable.

    CPU backends are excluded: their compiles are cheap, and XLA:CPU AOT
    cache entries embed the compiling machine's CPU features -- on
    migrating VMs a feature-mismatched entry SIGSEGVs at load (observed:
    the test suite segfaulted inside compilation_cache.get_executable
    loading an entry with '+prefer-no-gather' the current host lacks).
    """
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import os

    try:
        if jax.default_backend() == "cpu":
            return
        cache_dir = os.environ.get(
            "PYGEMMA_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "pygemma_tpu_xla"),
        )
        if cache_dir and cache_dir != "0":
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _result_keys(cfg) -> list:
    """Device-result rows of a stacked association block, in static order."""
    keys = ["beta", "se_beta", "tau", "lam", "F_wald"]
    if "lrt" in cfg.tests:
        keys += ["lambda_ml", "logl_H1"]
    if "score" in cfg.tests:
        keys += ["F_score"]
    return keys


@partial(jax.jit, static_argnames=("cfg", "de"))
def _assoc_block_jit(ev, W, y, Xblock, cfg, null_arr, de):
    """One SNP block -> a single stacked (n_keys, B) array.

    Stacking on device matters on tunneled backends: every separate
    device->host pull is a full synchronization round trip, so the driver
    fetches ONE buffer per block (or defers the fetch entirely)."""
    null = (
        NullFit(null_arr[0], null_arr[1], null_arr[2])
        if null_arr is not None
        else None
    )
    res = assoc_block(ev, W, y, Xblock, cfg, null=null, de=de)
    d = res._asdict()
    return jnp.stack([d[k] for k in _result_keys(cfg)])


@partial(jax.jit, static_argnames=("cfg",))
def _fit_null_jit(ev, W, y, cfg):
    nf = fit_null(ev, W, y, cfg)
    return jnp.stack([nf.lambda_reml, nf.lambda_ml, nf.loglik_ml])


# --- implicit low-rank scan helpers (no n x n eigenbasis; see
# core/lowrank.py::ImplicitBasis and core/grams.py::GramComplement) --------


class _ImplicitScan(NamedTuple):
    """Driver-side bundle for the implicit low-rank scan path.

    ``prep_fn``/``assoc_fn`` are set on the mesh path (shard_map programs
    from :mod:`pygemma_tpu.parallel.dist`); None selects the single-device
    jits below.
    """

    U_top: jax.Array  # (n, p_k)
    W_raw: jax.Array  # (n, c) UNROTATED covariates
    Y_raw: jax.Array  # (n, k) UNROTATED phenotypes
    eps: float
    n_total: int
    prep_fn: object = None
    assoc_fn: object = None


@jax.jit
def _raw_gram(shared_raw):
    return pdot(shared_raw.T, shared_raw)


@jax.jit
def _implicit_prep(U_top, shared_raw, xb):
    """Per-block top-space rotation + lambda-independent raw terms.

    Replaces the n x n rotation GEMM (core/eigen.py::rotate) with an
    n x p_k one plus an n x s raw cross GEMM -- the only O(n) work the
    implicit scan does per block.
    """
    C_x = pdot(U_top.T, xb)  # (p_k, B)
    vS_raw = pdot(xb.T, shared_raw)  # (B, s)
    vv_raw = jnp.sum(xb * xb, axis=0)  # (B,)
    return C_x, vS_raw, vv_raw


@partial(jax.jit, static_argnames=("cfg", "de", "n_total"))
def _assoc_block_implicit_jit(ev_top, W_c, y_c, C_x, cfg, null_arr, de,
                              eps, S_raw, vS_raw, vv_raw, n_total):
    null = (
        NullFit(null_arr[0], null_arr[1], null_arr[2])
        if null_arr is not None else None
    )
    ictx = ImplicitCtx(eps, n_total, S_raw, vS_raw, vv_raw)
    res = assoc_block(ev_top, W_c, y_c, C_x, cfg, null=null, de=de,
                      implicit=ictx)
    d = res._asdict()
    return jnp.stack([d[k] for k in _result_keys(cfg)])


@partial(jax.jit, static_argnames=("cfg", "n_total"))
def _fit_null_implicit_jit(ev_top, W_c, y_c, cfg, eps, S_raw, n_total):
    # the per-SNP residual fields are unused by the null fit
    s = S_raw.shape[0]
    ictx = ImplicitCtx(eps, n_total, S_raw,
                       jnp.zeros((1, s), S_raw.dtype),
                       jnp.zeros((1,), S_raw.dtype))
    nf = fit_null(ev_top, W_c, y_c, cfg, implicit=ictx)
    return jnp.stack([nf.lambda_reml, nf.lambda_ml, nf.loglik_ml])


def estimate_lambda(eigenVals, Y, W, restricted: bool = True,
                    grid: bool = False,
                    config: Optional[GwasConfig] = None) -> float:
    """Variance-ratio estimate for a single design (rotated inputs).

    Public analogue of the reference's ``calc_lambda_restricted`` /
    ``calc_lambda`` entry points (pygemma_model.pyx:64, lmm/lmm.py:22-84):
    eigenVals (n,), Y (n,) outcome, W (n, q) design -- all already rotated
    into the kinship eigenbasis.
    """
    from .core.grams import pair_products
    from .core.solver import LambdaProblem, solve_lambda

    cfg = (config or from_env()).replace(grid=grid)
    dtype = np.dtype(cfg.dtype)
    ev = jnp.asarray(np.asarray(eigenVals, dtype).reshape(-1))
    Wd = jnp.asarray(np.asarray(W, dtype))
    v = jnp.asarray(np.asarray(Y, dtype).reshape(-1, 1))
    prob = LambdaProblem(
        ev, Wd, pair_products(Wd), v, v * v, Wd.shape[0], Wd.shape[1],
        False, restricted,
    )
    lam, _ = solve_lambda(prob, cfg)
    return float(lam[0])


def _kinship_fingerprint(Karr: np.ndarray, max_samples: int = 4096) -> str:
    """Content hash of K for the eigen-checkpoint key.

    Hashes a strided byte sample (bounded work even for 50k x 50k kinships)
    plus shape and dtype, so two kinships that merely agree on a few summary
    values can never silently reuse each other's cached eigenbasis."""
    import hashlib

    from .core.lowrank import LowRankKinship

    if isinstance(Karr, LowRankKinship):
        h = hashlib.blake2b(digest_size=16)
        h.update(b"lowrank|")
        h.update(Karr.fingerprint_bytes())
        return h.hexdigest()
    h = hashlib.blake2b(digest_size=16)
    h.update(repr((Karr.shape, Karr.dtype.str)).encode())
    stride = max(1, int(np.ceil(np.sqrt(Karr.size / max_samples))))
    sample = np.ascontiguousarray(Karr[::stride, ::stride]) \
        if Karr.ndim == 2 else np.ascontiguousarray(Karr[::stride])
    h.update(sample.tobytes())
    return h.hexdigest()


def _host_pvalues(res: dict, n: int, c: int, tests) -> None:
    """Recompute p-values on host in float64 with scipy for exact parity with
    the reference's ``stats.f.sf`` (lmm/lmm.py:482)."""
    df = n - c - 1
    res["p_wald"] = stats.f.sf(np.asarray(res["F_wald"], np.float64), 1, df)
    if "lrt" in tests:
        res["p_lrt"] = stats.chi2.sf(np.asarray(res.pop("D_lrt"), np.float64), 1)
    if "score" in tests:
        res["p_score"] = stats.f.sf(np.asarray(res.pop("F_score"), np.float64), 1, df)


def pygemma(
    Y,
    X,
    W=None,
    K=None,
    Z=None,
    snps: Optional[Sequence[str]] = None,
    verbose: int = 0,
    disable_checks: bool = True,
    de: bool = False,
    grid: bool = False,
    eigen: bool = True,
    nproc: Optional[int] = None,  # accepted for API parity; devices rule here
    tests: Optional[Sequence[str]] = None,
    config: Optional[GwasConfig] = None,
    run_dir: Optional[str] = None,
    mesh=None,
) -> pd.DataFrame:
    """Genome-wide LMM association scan (GEMMA method), TPU-native.

    Args mirror the reference driver (lmm/lmm.py:87-106):
      Y: (n,) or (n,1) phenotype (or (n,k): each column scanned in turn,
         results stacked with a ``pheno`` column).
      X: (n, p) genotype matrix.
      W: (n, c) covariates; None -> intercept only.
      K: (n, n) kinship, or, when ``eigen=False``, the precomputed eigenvalue
         vector of K with X/Y/W already rotated (the reference's external-
         eigendecomposition seam, experiments/large_gwas/run_pygemma.py:57-65).
      Z: optional loading matrix, K <- Z K Z' (lmm/lmm.py:124-125).
      de: differential-expression mode -- swaps roles of x and y
         (lmm/lmm.py:498-532).
      grid: pure grid-search lambda (pygemma_model.pyx:99-132).
      tests: any of "wald", "lrt", "score".
    """
    _enable_compile_cache()
    cfg = config or from_env()
    if grid:
        cfg = cfg.replace(grid=True)
    if tests is not None and tuple(tests) != cfg.tests:
        cfg = cfg.replace(tests=tuple(tests))
    log = StageLogger(verbose)

    dtype = np.dtype(cfg.dtype)
    Y = np.asarray(Y, dtype=dtype)
    if Y.ndim == 1:
        Y = Y[:, None]
    from .io.packed import PackedMatrix
    from .io.quantized import QuantizedMatrix

    _streamed_types = (QuantizedMatrix, PackedMatrix)
    if isinstance(X, _streamed_types):
        # int8 / 2-bit codes stream to device and dequantize there
        # (io/quantized.py, io/packed.py); never materialize the float32
        # matrix on host
        if dtype != np.float32:
            raise ValueError("quantized genotype streaming is float32-only")
    else:
        X = np.asarray(X, dtype=dtype)
    n, p = X.shape
    if W is None:
        W = np.ones((n, 1), dtype=dtype)
    else:
        W = np.asarray(W, dtype=dtype)
    c = W.shape[1]

    if not disable_checks:
        for name, arr in (("X", X), ("Y", Y), ("W", W)):
            if isinstance(arr, _streamed_types):
                # int8 codes cannot hold NaN, but a corrupt affine sidecar
                # (NaN mu, non-finite/zero sd) would propagate NaN/Inf into
                # every dequantized value
                if (np.isnan(arr.mu).any()
                        or not np.all(np.isfinite(arr.sd))
                        or (arr.sd <= 0).any()):
                    raise ValueError(
                        f"invalid quantization sidecar on {name}: "
                        "mu must be finite and sd finite-positive")
                continue
            if np.isnan(arr).any():
                raise ValueError(f"NaNs present in {name}")

    from .core.lowrank import LowRankKinship

    if Z is not None and eigen:
        if isinstance(K, LowRankKinship):
            raise ValueError("Z loading transform requires a dense K")
        K = np.asarray(loading_transform(jnp.asarray(Z, dtype), jnp.asarray(K, dtype)))

    # --- optional multi-chip mesh execution --------------------------------
    rot_fn = assoc_fn = eigh_fn = xb_sharding = None
    if mesh is not None:
        from .parallel.dist import (
            sharded_assoc_fn,
            sharded_eigh_fn,
            sharded_rotate_fn,
        )
        from .parallel.mesh import snp_sharding

        with_null = ("lrt" in cfg.tests) or ("score" in cfg.tests)
        assoc_fn = sharded_assoc_fn(mesh, cfg, de=de, with_null=with_null,
                                    keys=tuple(_result_keys(cfg)))
        rot_fn = sharded_rotate_fn(mesh, cfg)
        eigh_fn = sharded_eigh_fn(mesh, cfg)
        xb_sharding = snp_sharding(mesh, cfg.snp_axis)

    # --- overlap genotype transfer with the eigendecomposition ------------
    # When the device-resident packed-block cache is enabled AND
    # PYGEMMA_TPU_PREFETCH_OVERLAP=1, a background thread ships the 2-bit
    # blocks over the host->device link WHILE the kinship eigh runs on the
    # chip (puts only, no device compute contended); the scan then reads
    # from HBM.  OPT-IN because it assumes transfers do not stall device
    # control traffic -- true for directly-attached TPUs (DMA engines),
    # FALSE for this environment's tunneled backend, where the bulk
    # transfer queues ahead of the host-driven eigh's latency-critical
    # scalar pulls (measured: 20k end-to-end 36.9 s -> 84.3 s with the
    # overlap forced on).
    prefill_thread = prefill_stop = None
    if mesh is None and isinstance(X, PackedMatrix):
        import os as _os

        from .io.streaming import _cache_budget_bytes, prefill_device_cache

        if (_os.environ.get("PYGEMMA_TPU_PREFETCH_OVERLAP", "0") == "1"
                and _cache_budget_bytes() > 0
                and getattr(X, "cache_token", None) is not None):
            import threading

            prefill_stop = threading.Event()
            prefill_thread = threading.Thread(
                target=prefill_device_cache,
                args=(X, min(cfg.snp_block, max(p, 1)), prefill_stop),
                daemon=True,
            )
            prefill_thread.start()

    ckpt = None
    eig_key = ""
    if eigen and K is not None and not isinstance(K, jax.Array):
        K_for_key = K if isinstance(K, LowRankKinship) else np.asarray(K)
        eig_key = f"{_kinship_fingerprint(K_for_key)}|{cfg.dtype}"
    if run_dir is not None:
        from .utils.checkpoint import RunCheckpoint

        ckpt = RunCheckpoint(run_dir)
        ckpt.clean_stale()
        # Saved blocks are only resumable under the same settings.
        run_meta = {"tests": list(cfg.tests), "grid": cfg.grid,
                    "dtype": cfg.dtype, "de": de, "snp_block": cfg.snp_block}
        prev_meta = ckpt.load_meta()
        if prev_meta is None:
            ckpt.save_meta(run_meta)
        elif prev_meta != run_meta:
            raise ValueError(
                f"run_dir {run_dir} holds blocks computed with different "
                f"settings ({prev_meta}); use a fresh run_dir for "
                f"{run_meta}"
            )

    # --- eigendecomposition + rotation (lmm/lmm.py:151-167, 243-246) -------
    impl = None  # _ImplicitScan when the implicit low-rank path is active
    use_implicit = (
        eigen
        and isinstance(K, LowRankKinship)
        and cfg.lowrank_implicit is not False
    )
    if use_implicit:
        key_i = (eig_key + "|implicit") if eig_key else ""
        dev_cached = _EIGEN_DEV_CACHE.get(key_i) if key_i else None
        if dev_cached is not None:
            ev_dev, U_top = dev_cached
        else:
            cached = ckpt.load_eigen(key_i) if ckpt is not None else None
            if cached is not None:
                ev_dev = jnp.asarray(cached[0])
                U_top = jnp.asarray(cached[1])
            else:
                with log.stage("implicit low-rank eigendecomposition"):
                    from .core.lowrank import lowrank_top_basis

                    basis = lowrank_top_basis(K, cfg.eigh_backend)
                    ev_dev, U_top = basis.ev_top, basis.U_top
                    ev_dev.block_until_ready()
                if ckpt is not None:
                    ckpt.save_eigen(np.asarray(ev_dev), np.asarray(U_top),
                                    key_i)
            if key_i:
                _EIGEN_DEV_CACHE.clear()
                _EIGEN_DEV_CACHE[key_i] = (ev_dev, U_top)
        prep_fn = assoc_fn_impl = None
        if mesh is not None:
            # the (n, p_k) top basis replicates onto the mesh (feasible at
            # any n, unlike the n x n explicit basis) and the scan runs as
            # SNP-sharded shard_map programs
            from .parallel.dist import (
                sharded_assoc_implicit_fn,
                sharded_implicit_prep_fn,
            )
            from .parallel.mesh import put_replicated as _put_rep

            ev_dev = _put_rep(ev_dev, mesh)
            U_top = _put_rep(U_top, mesh)
            with_null = ("lrt" in cfg.tests) or ("score" in cfg.tests)
            prep_fn = sharded_implicit_prep_fn(mesh, cfg)
            assoc_fn_impl = sharded_assoc_implicit_fn(
                mesh, cfg, n_total=n, de=de, with_null=with_null,
                keys=tuple(_result_keys(cfg)),
            )
        with log.stage("rotation of W, Y (top space)"):
            W_raw_dev = jnp.asarray(W)
            Y_raw_dev = jnp.asarray(Y)
            if mesh is not None:
                W_raw_dev = _put_rep(W_raw_dev, mesh)
                Y_raw_dev = _put_rep(Y_raw_dev, mesh)
            W_dev = rotate(U_top, W_raw_dev)
            Y_dev = rotate(U_top, Y_raw_dev)
        U_dev = None  # no n x n basis exists on this path
        impl = _ImplicitScan(U_top, W_raw_dev, Y_raw_dev, float(K.eps), n,
                             prep_fn, assoc_fn_impl)
    elif eigen:
        dev_cached = _EIGEN_DEV_CACHE.get(eig_key) if eig_key else None
        if dev_cached is not None and mesh is None:
            ev_dev, U_dev = dev_cached
        else:
            cached = ckpt.load_eigen(eig_key) if ckpt is not None else None
            if cached is not None:
                ev_dev = jnp.asarray(cached[0])
                U_dev = jnp.asarray(cached[1])
            else:
                with log.stage("eigendecomposition"):
                    if isinstance(K, LowRankKinship):
                        from .core.lowrank import lowrank_eigendecompose

                        ev_dev, U_dev = lowrank_eigendecompose(
                            K, cfg.eigh_backend, dtype
                        )
                    elif mesh is not None and cfg.eigh_backend != "host":
                        # distributed eigh: K sharded over the sample axis
                        with mesh:
                            ev_dev, U_dev = eigh_fn(jnp.asarray(K, dtype))
                    else:
                        ev_dev, U_dev = auto_eigendecompose(
                            np.asarray(K, dtype), cfg.eigh_backend, dtype
                        )
                    if hasattr(ev_dev, "block_until_ready"):
                        ev_dev.block_until_ready()
                if ckpt is not None:
                    ckpt.save_eigen(np.asarray(ev_dev), np.asarray(U_dev),
                                    eig_key)
            if eig_key and mesh is None:
                _EIGEN_DEV_CACHE.clear()
                _EIGEN_DEV_CACHE[eig_key] = (jnp.asarray(ev_dev),
                                             jnp.asarray(U_dev))
        if mesh is not None:
            # an eigenbasis computed on a single device (host path, lowrank
            # path) must be replicated onto the mesh before sharded use
            from .parallel.mesh import put_replicated as _put_rep

            ev_dev = _put_rep(ev_dev, mesh)
            U_dev = _put_rep(U_dev, mesh)
        with log.stage("rotation of W, Y"):
            W_in, Y_in = jnp.asarray(W), jnp.asarray(Y)
            if mesh is not None:
                from .parallel.mesh import put_replicated as _put_rep2

                W_in = _put_rep2(W_in, mesh)
                Y_in = _put_rep2(Y_in, mesh)
            W_dev = rotate(U_dev, W_in)
            Y_dev = rotate(U_dev, Y_in)
    else:
        ev = np.maximum(0.0, np.asarray(K, dtype=dtype).reshape(-1))
        ev_dev = jnp.asarray(ev)
        U_dev = None
        W_dev = jnp.asarray(W)
        Y_dev = jnp.asarray(Y)
        if mesh is not None:
            from .parallel.mesh import put_replicated as _put_rep3

            ev_dev = _put_rep3(ev_dev, mesh)
            W_dev = _put_rep3(W_dev, mesh)
            Y_dev = _put_rep3(Y_dev, mesh)

    B = min(cfg.snp_block, max(p, 1))
    if mesh is not None and cfg.snp_axis in mesh.shape:
        # shard_map needs the block to divide evenly over the snp axis
        nsnp = mesh.shape[cfg.snp_axis]
        B = ((B + nsnp - 1) // nsnp) * nsnp
    n_pheno = Y.shape[1]

    # Batched multi-phenotype scan: one vmapped executable for all
    # phenotypes (eQTL-style workloads; reference runs a SLURM array per
    # gene instead, experiments/1000G/run_pyGEMMA.sh:43-52).
    if n_pheno >= 3 and mesh is None and ckpt is None:
        frames = _scan_phenos_batched(
            X, Y_dev, W_dev, ev_dev, U_dev, cfg, de, n, p, log, impl
        )
    else:
        frames = _scan_phenos_looped(
            X, Y_dev, W_dev, ev_dev, U_dev, cfg, de, n, p, B, log,
            ckpt, mesh, xb_sharding, rot_fn, assoc_fn, impl,
        )
    if prefill_thread is not None:
        prefill_stop.set()  # abandon any leftover blocks past the budget
        prefill_thread.join(timeout=30.0)
    results_df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    if snps is not None:
        results_df["SNPs"] = (
            list(snps) * n_pheno if n_pheno > 1 else list(snps)
        )
    return results_df


def _stacked_to_host(stacked) -> np.ndarray:
    """Device (n_keys, B) result block -> host ndarray.

    Under a multi-process mesh the block is SNP-sharded across processes
    (not fully addressable), so it is all-gathered first -- the in-program
    replacement for the reference's offline CSV concatenation
    (reference tests/combine_benchmarks.py:17-29); every process ends up
    with the identical full table."""
    if getattr(stacked, "is_fully_addressable", True):
        return np.asarray(stacked)
    import jax.experimental.multihost_utils as mhu

    return np.asarray(mhu.process_allgather(stacked, tiled=True))


def _scan_phenos_looped(X, Y_dev, W_dev, ev_dev, U_dev, cfg, de, n, p, B, log,
                        ckpt, mesh, xb_sharding, rot_fn, assoc_fn, impl=None):
    n_pheno = Y_dev.shape[1]
    c = W_dev.shape[1]
    dtype = X.dtype
    frames = []
    for ph in range(n_pheno):
        y_dev = Y_dev[:, ph]
        shared_raw = S_raw = eps_arr = None
        if impl is not None:
            # lambda-independent raw Gram of [W, y]: once per phenotype
            shared_raw = jnp.concatenate(
                [impl.W_raw, impl.Y_raw[:, ph:ph + 1]], axis=1
            )
            S_raw = _raw_gram(shared_raw)
            eps_arr = jnp.asarray(impl.eps, S_raw.dtype)
        null_arr = None
        if ("lrt" in cfg.tests) or ("score" in cfg.tests):
            with log.stage("null-model fit"):
                if impl is not None:
                    null_arr = _fit_null_implicit_jit(
                        ev_dev, W_dev, y_dev, cfg, eps_arr, S_raw,
                        impl.n_total,
                    )
                else:
                    null_arr = _fit_null_jit(ev_dev, W_dev, y_dev, cfg)

        cols = {k: [] for k in ("beta", "se_beta", "tau", "lambda", "F_wald")}
        if "lrt" in cfg.tests:
            cols["lambda_ml"] = []
            cols["logl_H1"] = []
            cols["D_lrt"] = []
        if "score" in cfg.tests:
            cols["F_score"] = []

        keys = _result_keys(cfg)
        null_ml = float(null_arr[2]) if null_arr is not None else None

        def block_to_cols(stacked: np.ndarray, m: int) -> dict:
            """(n_keys, B) host array -> output-column dict for one block."""
            d = dict(zip(keys, stacked))
            blk = {
                "beta": d["beta"][:m],
                "se_beta": d["se_beta"][:m],
                "tau": d["tau"][:m],
                "lambda": d["lam"][:m],
                "F_wald": d["F_wald"][:m],
            }
            if "lrt" in cfg.tests:
                blk["lambda_ml"] = d["lambda_ml"][:m]
                blk["logl_H1"] = d["logl_H1"][:m]
                blk["D_lrt"] = 2.0 * (
                    d["logl_H1"][:m].astype(np.float64) - null_ml
                )
            if "score" in cfg.tests:
                blk["F_score"] = d["F_score"][:m]
            return blk

        # The loop only *dispatches*: device results are pulled after the
        # last block (or by a background writer thread when run_dir
        # durability is on) so no host<->device sync sits between
        # dispatches -- each sync costs ~34 ms on tunneled backends, and an
        # eager pull would also serialize device compute with host work.
        pending = []  # (m, stacked device array) | ("blk", dict) | futures
        writer = None
        if ckpt is not None:
            import concurrent.futures as _cf

            # one writer: pulls a finished block and persists it while the
            # main thread keeps dispatching the next blocks
            writer = _cf.ThreadPoolExecutor(max_workers=1)

        def _pull_save(start_, m_, stacked_):
            blk = block_to_cols(_stacked_to_host(stacked_), m_)
            ckpt.save_block(ph * p + start_, blk)
            return blk

        with log.stage(f"association scan ({p} SNPs, n={n})"):
            # double-buffered host->device streaming: slice/pad/transfer of
            # block b+1 overlaps device compute on block b
            # (io/streaming.py; the reference's analogue is its mp.Pool
            # column-block iterator, lmm/lmm.py:427-436)
            from .io.streaming import SnpBlockStreamer

            if mesh is not None:
                # multi-chip: blocks stream under the snp sharding, so the
                # double-buffered int8/2-bit transfer path carries over
                # unchanged from the single-device scan
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                vec_sharding = NamedSharding(mesh, P(cfg.snp_axis))
                streamer = SnpBlockStreamer(
                    X, B, dtype=dtype, shardings=(xb_sharding, vec_sharding)
                )
            else:
                streamer = SnpBlockStreamer(X, B, dtype=dtype)
            stream_iter = iter(streamer)
            for start in log.track(range(0, p, B), "Testing SNPs..."):
                stop = min(start + B, p)
                m = stop - start
                prefetched = next(stream_iter)
                if ckpt is not None and ckpt.has_block(ph * p + start):
                    pending.append(("blk", ckpt.load_block(ph * p + start)))
                    continue
                xb_dev = prefetched[2]
                if impl is not None:
                    if impl.prep_fn is not None:  # mesh (SNP-sharded) path
                        C_x, vS_raw, vv_raw = impl.prep_fn(
                            impl.U_top, shared_raw, xb_dev
                        )
                        args = (ev_dev, W_dev, y_dev, C_x, eps_arr, S_raw,
                                vS_raw, vv_raw)
                        if null_arr is not None:
                            args = args + (null_arr,)
                        stacked = impl.assoc_fn(*args)
                    else:
                        C_x, vS_raw, vv_raw = _implicit_prep(
                            impl.U_top, shared_raw, xb_dev
                        )
                        stacked = _assoc_block_implicit_jit(
                            ev_dev, W_dev, y_dev, C_x, cfg, null_arr, de,
                            eps_arr, S_raw, vS_raw, vv_raw, impl.n_total,
                        )
                elif mesh is not None:
                    if U_dev is not None:
                        xb_dev = rot_fn(jnp.asarray(U_dev), xb_dev)
                    args = (ev_dev, W_dev, y_dev, xb_dev)
                    if null_arr is not None:
                        args = args + (null_arr,)
                    stacked = assoc_fn(*args)  # (n_keys, B), snp-sharded
                else:
                    if U_dev is not None:
                        xb_dev = rotate(U_dev, xb_dev)
                    stacked = _assoc_block_jit(
                        ev_dev, W_dev, y_dev, xb_dev, cfg, null_arr, de
                    )
                if writer is not None:
                    pending.append(writer.submit(_pull_save, start, m, stacked))
                else:
                    pending.append((m, stacked))

            for item in pending:
                if isinstance(item, tuple) and item[0] == "blk":
                    blk = item[1]
                elif isinstance(item, tuple):
                    blk = block_to_cols(_stacked_to_host(item[1]), item[0])
                else:
                    blk = item.result()  # writer future
                for k in cols:
                    cols[k].append(blk[k])
            if writer is not None:
                writer.shutdown()

        out = {k: np.concatenate(v) if v else np.array([]) for k, v in cols.items()}
        _host_pvalues(out, n, c, cfg.tests)
        df = pd.DataFrame(out)
        # Column order parity with the reference (lmm/lmm.py:129-142).
        order = ["beta", "se_beta", "tau", "lambda", "F_wald", "p_wald"]
        order += [k for k in df.columns if k not in order]
        df = df[order]
        if n_pheno > 1:
            df["pheno"] = ph
        frames.append(df)

    return frames


@partial(jax.jit, static_argnames=("cfg", "de", "with_null"))
def _assoc_multi_jit(ev, W, Y_kn, Xblock, cfg, null_stack, de, with_null):
    res = assoc_mod.assoc_block_multi(
        ev, W, Y_kn, Xblock, cfg,
        null_stack=null_stack if with_null else None, de=de,
    )
    # one stacked (n_keys, k, B) buffer per block (see _assoc_block_jit)
    return jnp.stack([res[k] for k in _result_keys(cfg)])


@partial(jax.jit, static_argnames=("cfg",))
def _fit_null_multi_jit(ev, W, Y_kn, cfg):
    return assoc_mod.fit_null_multi(ev, W, Y_kn, cfg)


@jax.jit
def _implicit_multi_once(W_raw, Y_raw):
    """Phenotype-factored raw Gram pieces shared by the whole scan."""
    WtW = pdot(W_raw.T, W_raw)
    WtY = pdot(W_raw.T, Y_raw)
    YtY = jnp.sum(Y_raw * Y_raw, axis=0)
    return WtW, WtY, YtY


@jax.jit
def _implicit_multi_prep(U_top, W_raw, Y_raw, xb):
    """Per-block top-space rotation + factored raw terms (multi-pheno)."""
    C_x = pdot(U_top.T, xb)
    XtW = pdot(xb.T, W_raw)
    XtY = pdot(xb.T, Y_raw)
    vv = jnp.sum(xb * xb, axis=0)
    return C_x, XtW, XtY, vv


@partial(jax.jit, static_argnames=("cfg", "de", "with_null", "n_total"))
def _assoc_multi_implicit_jit(ev, W_c, Y_kn, C_x, cfg, null_stack, de,
                              with_null, eps, WtW, WtY, YtY, XtW, XtY, vv,
                              n_total):
    m = assoc_mod.ImplicitMultiCtx(eps, n_total, WtW, WtY, YtY, XtW, XtY,
                                   vv)
    res = assoc_mod.assoc_block_multi(
        ev, W_c, Y_kn, C_x, cfg,
        null_stack=null_stack if with_null else None, de=de,
        implicit_multi=m,
    )
    return jnp.stack([res[k] for k in _result_keys(cfg)])


@partial(jax.jit, static_argnames=("cfg", "n_total"))
def _fit_null_multi_implicit_jit(ev, W_c, Y_kn, cfg, eps, WtW, WtY, YtY,
                                 n_total):
    B1 = jnp.zeros((1, WtW.shape[0]), WtW.dtype)  # X terms unused in null
    m = assoc_mod.ImplicitMultiCtx(eps, n_total, WtW, WtY, YtY, B1,
                                   jnp.zeros((1, WtY.shape[1]), WtW.dtype),
                                   jnp.zeros((1,), WtW.dtype))
    return assoc_mod.fit_null_multi(ev, W_c, Y_kn, cfg, implicit_multi=m)


def _scan_phenos_batched(X, Y_dev, W_dev, ev_dev, U_dev, cfg, de, n, p, log,
                         impl=None):
    """All phenotypes per block in one vmapped executable (k, B).

    With ``impl`` (implicit low-rank kinship) the genotypes stream ONCE for
    all phenotypes -- the per-phenotype raw Gram terms factor into shared
    W-blocks plus one cross column each (assoc.ImplicitMultiCtx)."""
    n_pheno = Y_dev.shape[1]
    c = W_dev.shape[1]
    if (n_pheno <= assoc_mod._MULTI_UNROLL
            and assoc_mod._use_fused(cfg, np.dtype(cfg.dtype))):
        # trace-time-unrolled phenotypes keep the fused kernel: no (k, B, n)
        # weight temporaries, so the block stays full-width
        B = min(cfg.snp_block, max(p, 1))
    else:
        # shrink the block so the (k, B, n) weight temporaries stay bounded
        B = max(128, min(cfg.snp_block, max(p, 1)) // n_pheno)
    Y_kn = jnp.asarray(Y_dev).T  # (k, n) or (k, p_k) in the implicit case

    eps_arr = WtW = WtY = YtY = None
    if impl is not None:
        WtW, WtY, YtY = _implicit_multi_once(impl.W_raw, impl.Y_raw)
        eps_arr = jnp.asarray(impl.eps, WtW.dtype)

    with_null = ("lrt" in cfg.tests) or ("score" in cfg.tests)
    null_stack = None
    if with_null:
        with log.stage(f"null-model fits ({n_pheno} phenotypes)"):
            if impl is not None:
                null_stack = _fit_null_multi_implicit_jit(
                    ev_dev, W_dev, Y_kn, cfg, eps_arr, WtW, WtY, YtY,
                    impl.n_total,
                )
            else:
                null_stack = _fit_null_multi_jit(ev_dev, W_dev, Y_kn, cfg)

    keys = _result_keys(cfg)
    cols = {k: [] for k in keys}

    with log.stage(
        f"association scan ({p} SNPs x {n_pheno} phenotypes, n={n})"
    ):
        from .io.streaming import SnpBlockStreamer

        pending = []  # dispatch-only loop; pull everything afterwards
        for start, stop, xb_dev in SnpBlockStreamer(X, B, dtype=X.dtype):
            if impl is not None:
                C_x, XtW, XtY, vv = _implicit_multi_prep(
                    impl.U_top, impl.W_raw, impl.Y_raw, xb_dev
                )
                stacked = _assoc_multi_implicit_jit(
                    ev_dev, W_dev, Y_kn, C_x, cfg, null_stack, de,
                    with_null, eps_arr, WtW, WtY, YtY, XtW, XtY, vv,
                    impl.n_total,
                )
            else:
                if U_dev is not None:
                    xb_dev = rotate(jnp.asarray(U_dev), xb_dev)
                stacked = _assoc_multi_jit(
                    ev_dev, W_dev, Y_kn, xb_dev, cfg, null_stack, de,
                    with_null
                )
            pending.append((stop - start, stacked))
        for m, stacked in pending:
            host = np.asarray(stacked)  # (n_keys, k, B)
            for i, k in enumerate(keys):
                cols[k].append(host[i, :, :m])  # (k, m)

    full = {k: np.concatenate(v, axis=1) for k, v in cols.items()}  # (k, p)
    frames = []
    for ph in range(n_pheno):
        out = {
            "beta": full["beta"][ph],
            "se_beta": full["se_beta"][ph],
            "tau": full["tau"][ph],
            "lambda": full["lam"][ph],
            "F_wald": full["F_wald"][ph],
        }
        if "lrt" in cfg.tests:
            out["lambda_ml"] = full["lambda_ml"][ph]
            out["logl_H1"] = full["logl_H1"][ph]
            out["D_lrt"] = 2.0 * (
                full["logl_H1"][ph].astype(np.float64)
                - float(null_stack[ph, 2])
            )
        if "score" in cfg.tests:
            out["F_score"] = full["F_score"][ph]
        _host_pvalues(out, n, c, cfg.tests)
        df = pd.DataFrame(out)
        order = ["beta", "se_beta", "tau", "lambda", "F_wald", "p_wald"]
        order += [k for k in df.columns if k not in order]
        df = df[order]
        df["pheno"] = ph
        frames.append(df)
    return frames
