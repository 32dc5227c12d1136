"""Exact low-rank kinship eigendecomposition, on device.

A GRM built from p_k SNPs is exactly low-rank plus a ridge:

    K = s * G G' + eps * I,      G (n, p_k) standardized genotypes, p_k < n

Its FULL eigendecomposition never needs an O(n^3) dense eigh: with
A = s * G'G = V diag(a) V' (p_k x p_k),

    top eigenpairs:        ev_i = a_i + eps,  u_i = G v_i * sqrt(s / a_i)
    complement (n - p_k):  ev = eps, any orthonormal basis of null(G')

so the whole basis comes from one p_k x p_k eigh plus device GEMMs and a
QR-completed complement.  The reference outsources exactly this large-n
eigendecomposition to SLATE distributed linear algebra
(experiments/large_gwas/run_pygemma.sh:10,28, consumed via eigen=False at
lmm/lmm.py:196-211); here it collapses onto a single chip because the
benched kinship's low-rank structure is exploited instead of being handed
to a dense solver.  At n=20k, p_k=16,384 this replaces a 435 s host-LAPACK
eigh (plus a ~20 s eigenbasis upload through the tunnel) with device work.

Exactness is to float32 roundoff; tests/test_lowrank.py checks the whole
basis against the dense float64 oracle and the end-to-end driver outputs
against the dense-K path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class LowRankKinship:
    """Symbolic kinship ``K = scale * G G' + eps * I`` (never materialized).

    ``G``: (n, p_k) array-like of standardized/centered SNP columns --
    ndarray, memmap, QuantizedMatrix or PackedMatrix (column blocks are
    pulled host-side and shipped once).
    ``scale``: defaults to 1/p_k (the GRM convention K = GG'/p).
    ``eps``: ridge added to the diagonal (reference benches use 1e-3).
    ``center``: re-center columns on device before the Gram (exactly
    matching ``io.kinship.kinship_blocked``'s centered accumulation).
    """

    def __init__(self, G, scale: Optional[float] = None, eps: float = 0.0,
                 center: bool = True):
        self.G = G
        n, pk = G.shape
        if pk >= n:
            raise ValueError(
                f"low-rank path needs p_k < n (got G {G.shape}); "
                "use a dense kinship instead")
        self.n = int(n)
        self.pk = int(pk)
        self.scale = float(scale) if scale is not None else 1.0 / pk
        self.eps = float(eps)
        self.center = bool(center)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    def dense(self) -> np.ndarray:
        """Materialize K on host (tests / small problems only)."""
        Gf = np.asarray(self.G[:, :], np.float64)
        if self.center:
            Gf = Gf - Gf.mean(0, keepdims=True)
        K = self.scale * (Gf @ Gf.T)
        K[np.diag_indices(self.n)] += self.eps
        return K.astype(np.float32)

    def fingerprint_bytes(self) -> bytes:
        """Strided content sample for the driver's eigen-checkpoint key."""
        # quantized/packed sources: hash raw codes; ndarrays: hash values
        src = self.G.data if hasattr(self.G, "quant_block") else self.G
        arr = np.asarray(src[:: max(1, src.shape[0] // 64),
                             :: max(1, src.shape[1] // 64)])
        return (repr((self.n, self.pk, self.scale, self.eps,
                      self.center)).encode() + arr.tobytes())


@partial(jax.jit, static_argnames=("center",))
def _gram_scaled(G_dev, scale, center: bool):
    """A = scale * Gc'Gc with on-device column re-centering
    (Gc = G - 1 mu'); one MXU GEMM, split-precision accumulation."""
    if center:
        G_dev = G_dev - jnp.mean(G_dev, axis=0, keepdims=True)
    return scale * jnp.dot(G_dev.T, G_dev, precision=_HI), G_dev


@jax.jit
def _top_basis(Gc_dev, V, a, scale, rank_tol):
    """U_top = Gc V * sqrt(scale / a) with tiny-a columns zeroed."""
    GV = jnp.dot(Gc_dev, V, precision=_HI)
    a_ok = a > rank_tol
    inv = jnp.where(a_ok, jnp.sqrt(scale / jnp.maximum(a, rank_tol)), 0.0)
    return GV * inv[None, :], a_ok


@jax.jit
def _complement_qr(U_top, Z):
    """Orthonormal basis of the orthogonal complement of span(U_top):
    project a random block out of the span twice (one re-orthogonalization
    pass keeps f32 drift ~1e-6), then QR."""
    R = Z - jnp.dot(U_top, jnp.dot(U_top.T, Z, precision=_HI), precision=_HI)
    Q, _ = jnp.linalg.qr(R)
    Q = Q - jnp.dot(U_top, jnp.dot(U_top.T, Q, precision=_HI), precision=_HI)
    Q, _ = jnp.linalg.qr(Q)
    return Q


def lowrank_eigendecompose(
    lrk: LowRankKinship,
    backend: str = "auto",
    dtype=np.float32,
    block: int = 8192,
    seed: int = 0,
    rank_rtol: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full (ev, U) of K = scale * G G' + eps * I without forming K.

    Returns eigenvalues ascending with the reference's >=0 clamp
    (lmm/lmm.py:157) and the complete n x n eigenbasis, both device-resident.
    The p_k x p_k Gram eigh runs on device when admissible, else host.
    """
    from ..io.streaming import SnpBlockStreamer
    from .eigen import auto_eigendecompose

    n, pk = lrk.n, lrk.pk

    # 1) stream G's SNP columns to device once (packed/quantized sources
    #    ship their codes and dequantize on device), then one MXU Gram
    cols = [xb[:, : min(stop, pk) - start]
            for start, stop, xb in SnpBlockStreamer(lrk.G, min(block, pk))]
    G_dev = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    del cols
    A, Gc_dev = _gram_scaled(G_dev.astype(jnp.float32),
                             jnp.float32(lrk.scale), lrk.center)
    del G_dev

    # 2) eigh of the small Gram (ascending)
    a, V = auto_eigendecompose(A, backend=backend, dtype=np.float32)
    a = jnp.maximum(jnp.asarray(a), 0.0)
    V = jnp.asarray(V)

    # 3) top eigenbasis via one GEMM; rank guard folds near-null directions
    #    into the eps eigenspace
    rank_tol = float(rank_rtol) * float(jnp.max(a))
    U_top, a_ok = _top_basis(Gc_dev, V, a, lrk.scale, rank_tol)
    n_null = int(jnp.sum(~a_ok))
    del Gc_dev

    # 4) complement basis: n - pk dims (+ any rank-deficient Gram dims)
    n_comp = n - pk + n_null
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.standard_normal((n, n_comp)).astype(np.float32))
    # zeroed rank-deficient columns of U_top are harmless in the projector
    Q_c = _complement_qr(U_top, Z)

    # 5) assemble ascending: [eps * (n_comp), a_kept + eps]
    if n_null:
        keep = np.asarray(a_ok)
        a = a[jnp.asarray(np.where(keep)[0])]
        U_top = U_top[:, jnp.asarray(np.where(keep)[0])]
    ev = jnp.concatenate([jnp.full((n_comp,), lrk.eps, jnp.float32),
                          a + lrk.eps])
    U = jnp.concatenate([Q_c, U_top], axis=1)
    if np.dtype(dtype) != np.float32:
        ev = ev.astype(dtype)
        U = U.astype(dtype)
    return jnp.maximum(ev, 0.0), U
