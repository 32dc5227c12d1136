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
