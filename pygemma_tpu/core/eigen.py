"""Kinship eigendecomposition and eigenbasis rotation.

Reference behaviour being reproduced (lmm/lmm.py:151-167, 196-211, 243-246):
``eigh(K)``, clamp eigenvalues at zero, rotate X/Y/W by U'.  The ``eigen=False``
path accepts a precomputed eigenvalue vector with already-rotated inputs (the
reference's SLATE seam, experiments/large_gwas/run_pygemma.py:44-65); here the
in-program replacement for that seam is sharded ``eigh`` under a device mesh
(see pygemma_tpu/parallel/dist_eigh.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def eigendecompose(K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition with the reference's eigenvalue clamp.

    Returns (eigenvalues (n,), eigenvectors U (n, n)) with eigenvalues
    clamped at 0 (reference lmm/lmm.py:157).  On TPU ``jnp.linalg.eigh``
    lowers to a QDWH-based spectral divide-and-conquer built from matmuls,
    which GSPMD can partition across a mesh -- the in-program replacement for
    the reference's external SLATE eigendecomposition.
    """
    ev, U = jnp.linalg.eigh(K)
    return jnp.maximum(ev, 0.0), U


@jax.jit
def rotate(U: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """Rotate columns of M into the eigenbasis: U' M (lmm/lmm.py:243-246)."""
    return U.T @ M


def loading_transform(Z: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Random-effect loading transform K <- Z K Z' (lmm/lmm.py:124-125)."""
    return Z @ K @ Z.T
