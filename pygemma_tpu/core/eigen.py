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
    """Rotate columns of M into the eigenbasis: U' M (lmm/lmm.py:243-246).

    TPU XLA's default f32 matmul is a single bf16 MXU pass (~2^-8 operand
    rounding) whose error lands directly on the rotated genotypes;
    Precision.HIGH (bf16x3 split) restores ~2^-16 operand accuracy at a
    third of HIGHEST's cost, and rotation is the largest GEMM in the scan.
    """
    return jnp.dot(U.T, M, precision=jax.lax.Precision.HIGH)


def loading_transform(Z: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Random-effect loading transform K <- Z K Z' (lmm/lmm.py:124-125)."""
    P = jax.lax.Precision.HIGHEST
    return jnp.dot(jnp.dot(Z, K, precision=P), Z.T, precision=P)


def host_eigendecompose(K, dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LAPACK eigh on the host CPU with the same eigenvalue clamp.

    Used when a single accelerator cannot hold the O(n^2) QDWH-eigh temps
    (XLA's spectral divide-and-conquer needs ~25x n^2 floats of HBM scratch;
    a lone v5e OOMs near n=10k).  Matches the reference's own CPU
    ``scipy.linalg.eigh`` path (lmm/lmm.py:151).
    """
    import numpy as np

    Kh = np.asarray(K)
    try:  # torch's LAPACK is substantially faster than scipy's here
        import torch

        evt, Ut = torch.linalg.eigh(torch.from_numpy(np.ascontiguousarray(Kh)))
        ev, U = evt.numpy(), Ut.numpy()
    except Exception:
        import scipy.linalg

        ev, U = scipy.linalg.eigh(Kh)
    ev = np.maximum(ev, 0.0)
    if dtype is not None:
        ev = ev.astype(dtype)
        U = U.astype(dtype)
    # Returned as host (NumPy) arrays deliberately: downstream jnp ops move
    # them host->device once; round-tripping through the accelerator here
    # would pay a device->host pull on interconnects where that is slow.
    return ev, U


def _device_hbm_bytes() -> int:
    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats()
        limit = int(stats.get("bytes_limit", 0))
        if limit:
            return limit
    except Exception:
        pass
    # memory_stats() is unavailable through the axon tunnel (returns None);
    # fall back to the device generation's known HBM so the D&C path is not
    # silently rejected as "no memory" (measured: this fallback mattered --
    # hbm=0 sent a 16,384 Gram eigh to a 415 s host LAPACK call)
    if dev.platform == "tpu":
        kind = getattr(dev, "device_kind", "").lower()
        if "v5 lite" in kind or "v5e" in kind:
            return 16 << 30
        if "v6 lite" in kind or "v6e" in kind:
            return 32 << 30  # Trillium has 32 GB HBM
        if "v5p" in kind:
            return 95 << 30
        if "v4" in kind or "v5" in kind or "v6" in kind:
            return 32 << 30
        if "v3" in kind:
            return 16 << 30
        # unknown kinds (incl. v2 at 8 GB): a conservative default can only
        # route to host LAPACK, never admit an OOM-ing device path
        return 8 << 30
    return 0


#: largest n the backend's monolithic jnp.linalg.eigh graph is known to
#: compile (measured on the axon remote-compile service: 8,192 ok in ~5 s
#: warm, 12,288+ crashes the compile helper with HTTP 500)
DIRECT_EIGH_COMPILE_MAX = 8192


def device_eigh_admissible(n: int, hbm: int, n_shards: int = 1) -> bool:
    """Whether a MONOLITHIC n x n device eigh is runnable: it must both
    fit HBM (~30 n^2 floats of QDWH scratch) and stay under the remote
    compiler's graph-size ceiling (DIRECT_EIGH_COMPILE_MAX, single shard).

    ``n_shards`` is the number of devices the *caller* shards the eigh over
    (1 for the unsharded driver path).
    """
    if n_shards <= 1 and n > DIRECT_EIGH_COMPILE_MAX:
        return False
    itemsize = 4
    need = 30 * n * n * itemsize  # QDWH scratch estimate (~30 n^2 floats)
    if hbm and need > 0.8 * hbm * max(1, n_shards):
        return False
    if hbm == 0 and n > 6000:
        return False
    return True


def dc_eigh_admissible(n: int, hbm: int) -> bool:
    """Whether the host-driven divide-and-conquer (core/eigh_dc.py) fits:
    peak live set ~8 n^2 floats (sign iterates + projector + bases)."""
    if hbm:
        return 8 * n * n * 4 <= 0.8 * hbm
    return n <= 8192


def auto_eigendecompose(K, backend: str = "auto", dtype=None,
                        n_shards: int = 1):
    """Pick the eigendecomposition strategy.

    "auto" on an accelerator: the monolithic device eigh when it both
    compiles and fits (n <= 8,192 per shard), else the host-driven
    spectral divide-and-conquer (core/eigh_dc.py -- GEMMs at full size,
    factorizations only at <= 8,192) when HBM allows, else host LAPACK.
    "host"/"device"/"dc" force a strategy.
    """
    if backend == "host":
        return host_eigendecompose(K, dtype)
    if backend == "device":
        return eigendecompose(jnp.asarray(K))
    if backend == "dc":
        from .eigh_dc import eigh_dc

        ev, U = eigh_dc(jnp.asarray(K))
        return jnp.maximum(ev, 0.0), U
    n = K.shape[0]
    if jax.local_devices()[0].platform == "cpu":
        # virtual-CPU test meshes: jnp eigh is fine and shardable
        return eigendecompose(jnp.asarray(K))
    hbm = _device_hbm_bytes()
    if n <= 4096:
        # small problems: LAPACK runtime is trivial while the accelerator
        # QDWH-eigh pays a large one-time compile -- host wins outright
        return host_eigendecompose(K, dtype)
    if device_eigh_admissible(n, hbm, n_shards):
        return eigendecompose(jnp.asarray(K))
    if dc_eigh_admissible(n, hbm):
        from .eigh_dc import eigh_dc

        try:
            ev, U = eigh_dc(jnp.asarray(K))
            return jnp.maximum(ev, 0.0), U
        except RuntimeError:
            pass  # unsplittable spectrum or compile trouble -> host
    return host_eigendecompose(K, dtype)
