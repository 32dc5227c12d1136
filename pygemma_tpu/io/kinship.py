"""Kinship (genetic relatedness) matrix builders, on device.

Reference equivalents: centered K = X_c X_c' / p used throughout
(experiments/wtccc/run_pygemma.py:445, tests/test_pygemma.py:184-192) and the
GCTA/GEMMA "-gk 2" standardized variant.  On TPU the n x n Gram is a single
large matmul; for n beyond one chip's HBM shard the sample axis with
``pygemma_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def centered_kinship(X: jnp.ndarray) -> jnp.ndarray:
    """GEMMA -gk 1: K = (X - mean) (X - mean)' / p."""
    Xc = X - jnp.mean(X, axis=0, keepdims=True)
    return (Xc @ Xc.T) / X.shape[1]


@jax.jit
def standardized_kinship(X: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """GEMMA -gk 2: columns centered and scaled to unit variance first."""
    Xc = X - jnp.mean(X, axis=0, keepdims=True)
    Xs = Xc / jnp.maximum(jnp.std(X, axis=0, keepdims=True), eps)
    return (Xs @ Xs.T) / X.shape[1]


def kinship_blocked(X: np.ndarray, block: int = 8192,
                    standardize: bool = False) -> np.ndarray:
    """Accumulate K over SNP blocks for genotype matrices larger than HBM.

    Streams (n, b) blocks host->device and accumulates the n x n Gram on
    device; the TPU-side analogue of the reference's out-of-core kinship
    handling (experiments/benchmarks/matrix_reader.cpp).
    """
    n, p = X.shape
    K = jnp.zeros((n, n), jnp.float32)

    @jax.jit
    def acc(K, xb):
        xb = xb - jnp.mean(xb, axis=0, keepdims=True)
        if standardize:
            xb = xb / jnp.maximum(jnp.std(xb, axis=0, keepdims=True), 1e-6)
        return K + xb @ xb.T

    for s in range(0, p, block):
        xb = jnp.asarray(np.asarray(X[:, s:s + block], dtype=np.float32))
        K = acc(K, xb)
    return np.asarray(K / p)


def write_gcta_grm(prefix: str, K: np.ndarray, sample_ids=None,
                   n_snps: int = 0) -> None:
    """Write K in GCTA binary GRM format (.grm.bin/.grm.N.bin/.grm.id).

    The rival-benchmark seam the reference drives from R
    (experiments/benchmarks/subsample.R:98-110 times ``gcta --mlma`` against
    a GRM): float32 lower triangle incl. diagonal in (i, j<=i) order, a
    per-pair SNP-count file, and FID/IID lines.
    """
    K = np.asarray(K, np.float32)
    n = K.shape[0]
    sample_ids = sample_ids or [f"id{i}" for i in range(n)]
    idx = np.tril_indices(n)
    # tril_indices is row-major over (i, j<=i) -- exactly GCTA's pair order
    with open(prefix + ".grm.bin", "wb") as f:
        f.write(np.ascontiguousarray(K[idx], np.float32).tobytes())
    with open(prefix + ".grm.N.bin", "wb") as f:
        f.write(np.full(len(idx[0]), max(n_snps, 1),
                        np.float32).tobytes())
    with open(prefix + ".grm.id", "w") as f:
        for i, sid in enumerate(sample_ids):
            f.write(f"fam{i}\t{sid}\n")


def read_gcta_grm(prefix: str) -> np.ndarray:
    """Read a GCTA binary GRM back into a dense symmetric (n, n) matrix."""
    with open(prefix + ".grm.id") as f:
        n = sum(1 for line in f if line.strip())
    vals = np.frombuffer(open(prefix + ".grm.bin", "rb").read(),
                         np.float32)
    K = np.zeros((n, n), np.float32)
    idx = np.tril_indices(n)
    K[idx] = vals
    K[(idx[1], idx[0])] = vals
    return K
