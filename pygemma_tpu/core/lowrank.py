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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class ImplicitBasis(NamedTuple):
    """Top eigenspace of a low-rank kinship, WITHOUT the n x n basis.

    Because every complement direction of K = s*GG' + eps*I shares the
    single eigenvalue eps, the association scan never needs an explicit
    complement basis: Grams are built from ``C = U_top' T`` plus
    lambda-independent residuals (core/grams.py::GramComplement).  This is
    the memory/compute unlock for the n = 50k reference design point
    (experiments/large_gwas/run_pygemma.sh:17-34): the basis footprint
    drops from n^2 to n*p_k and the per-block rotation GEMM from n^2*B to
    n*p_k*B.

    ``ev_top``: (p_k,) kinship eigenvalues of the top space (a_i + eps,
    ascending; rank-deficient Gram directions hold exactly eps).
    ``U_top``: (n, p_k) orthonormal columns (zero on rank-deficient dirs).
    """

    ev_top: jnp.ndarray
    U_top: jnp.ndarray
    eps: float
    n: int


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


def _stream_gram(lrk: LowRankKinship, block: int):
    """Stream G's columns to device once and build the scaled p_k x p_k
    Gram (packed/quantized sources ship codes and dequantize on device)."""
    from ..io.streaming import SnpBlockStreamer

    pk = lrk.pk
    cols = [xb[:, : min(stop, pk) - start]
            for start, stop, xb in SnpBlockStreamer(lrk.G, min(block, pk))]
    G_dev = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)
    del cols
    return _gram_scaled(G_dev.astype(jnp.float32),
                        jnp.float32(lrk.scale), lrk.center)


def _top_space(lrk: LowRankKinship, backend: str, block: int,
               rank_rtol: float, timings: Optional[dict] = None,
               respool_bytes: int = 1 << 31):
    """(ev_top, U_top, n_null): the exact top eigenspace of K.

    ev_top holds a_i + eps for kept Gram directions and exactly eps for
    rank-deficient ones (whose U_top column is zeroed), so downstream
    weight sums over the p_k entries are exact with static shapes.

    ``timings`` (optional dict) receives per-stage wall seconds -- with
    device syncs at the stage boundaries, so only pass it when profiling.
    Syncs are scalar PULLS, not ``block_until_ready``: on tunneled
    backends the latter returns before remote execution finishes, so the
    stage cost would otherwise be billed to whichever later stage pulls
    first (measured round 4: a 400 s Gram reported as 2.8 s).
    """
    import time as _t

    from .eigen import auto_eigendecompose

    t0 = _t.time()
    A, Gc_dev = _stream_gram(lrk, block)
    # at large n the (n, p_k) float32 G cannot sit in HBM next to the
    # Gram eigh's scratch (~30 * 8192^2 floats at the leaves): drop it and
    # re-stream AFTER the eigh -- the packed codes are 16x smaller over
    # the tunnel and the rebuild is deterministic (OOM observed at n=50k)
    respool = lrk.n * lrk.pk * 4 > respool_bytes
    if respool:
        float(jnp.sum(A))  # make sure A exists before freeing its input
        del Gc_dev
    if timings is not None:
        float(jnp.sum(A))  # data-dependent pull = real sync
        timings["stream_gram_s"] = round(_t.time() - t0, 3)
        t0 = _t.time()
    a, V = auto_eigendecompose(A, backend=backend, dtype=np.float32)
    a = jnp.maximum(jnp.asarray(a), 0.0)
    V = jnp.asarray(V)
    del A
    if timings is not None:
        float(jnp.sum(a) + jnp.sum(V[0]))
        timings["gram_eigh_s"] = round(_t.time() - t0, 3)
        t0 = _t.time()
    if respool:
        _, Gc_dev = _stream_gram(lrk, block)
    rank_tol = float(rank_rtol) * float(jnp.max(a))
    U_top, a_ok = _top_basis(Gc_dev, V, a, lrk.scale, rank_tol)
    n_null = int(jnp.sum(~a_ok))
    ev_top = jnp.where(a_ok, a, 0.0) + jnp.float32(lrk.eps)
    if timings is not None:
        float(jnp.sum(U_top[0]))
        timings["top_basis_s"] = round(_t.time() - t0, 3)
    return ev_top, U_top, a, a_ok, n_null


def lowrank_top_basis(
    lrk: LowRankKinship,
    backend: str = "auto",
    block: int = 8192,
    rank_rtol: float = 1e-6,
    timings: Optional[dict] = None,
    respool_bytes: int = 1 << 31,
) -> ImplicitBasis:
    """Implicit eigendecomposition: top space only, no complement basis.

    The whole cost is one p_k x p_k Gram eigh plus two device GEMMs; the
    (n - p_k)-dimensional eps-eigenspace is represented symbolically (see
    :class:`ImplicitBasis`).  Replaces the reference's external SLATE
    eigendecomposition seam (experiments/large_gwas/run_pygemma.sh:10,28)
    at ANY n without ever materializing an n x n object.
    """
    ev_top, U_top, _, _, _ = _top_space(lrk, backend, block, rank_rtol,
                                        timings, respool_bytes)
    return ImplicitBasis(jnp.maximum(ev_top, 0.0), U_top,
                         float(lrk.eps), lrk.n)


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
    Prefer :func:`lowrank_top_basis` for scans: the explicit complement QR
    below costs O(n^2 (n - p_k)) and an n x n basis; it exists for parity
    tests and for consumers that genuinely need the full U.
    """
    n, pk = lrk.n, lrk.pk

    _, U_top, a, a_ok, n_null = _top_space(lrk, backend, block, rank_rtol)

    # 4) complement basis: n - pk dims (+ any rank-deficient Gram dims).
    # Device-side Gaussians: a host block would ship n * n_comp floats
    # through the tunnel (~290 MB at the bench shape).
    n_comp = n - pk + n_null
    Z = jax.random.normal(jax.random.PRNGKey(seed), (n, n_comp),
                          dtype=jnp.float32)
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
