"""Implicit-complement low-rank scan vs the explicit full-basis path.

For K = s GG' + eps I the complement eigenspace has the single eigenvalue
eps, so the scan can run entirely in the p_k-dim top space with
lambda-independent residual Grams (core/grams.py::GramComplement) -- no
n x n eigenbasis, no complement QR.  This is the TPU-native replacement for
the reference's external large-n eigendecomposition seam
(reference experiments/large_gwas/run_pygemma.sh:17-34, lmm/lmm.py:196-211).
These tests pin the implicit path to the explicit one (and to the dense-K
oracle) bit-tight in float64 and to f32 roundoff through the driver.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax.numpy as jnp

from pygemma_tpu import GwasConfig, LowRankKinship, pygemma
from pygemma_tpu.core.assoc import ImplicitCtx, assoc_block, fit_null
from pygemma_tpu.core.grams import (
    GramComplement,
    grams_per_snp_lambda,
    grams_shared_lambda,
    grams_shared_multi,
    pair_products,
)
from pygemma_tpu.core.lowrank import lowrank_top_basis


def _case(rng, n=140, pk=40, c=2, p=24, dtype=np.float32):
    G = rng.binomial(2, 0.3, size=(n, pk)).astype(dtype)
    G = (G - G.mean(0)) / np.maximum(G.std(0), 1e-6)
    lrk = LowRankKinship(G, eps=1e-3)
    W = np.c_[np.ones(n), rng.standard_normal((n, c - 1))].astype(dtype)
    y = (0.4 * G[:, :4].sum(1) + rng.standard_normal(n)).astype(dtype)
    X = rng.binomial(2, 0.4, size=(n, p)).astype(dtype)
    X = (X - X.mean(0)) / np.maximum(X.std(0), 1e-6)
    return lrk, G, W, y, X


def _implicit_inputs(lrk, W, y, X, dtype=np.float64):
    """Exact float64 top space + residual terms (test-side construction)."""
    G = np.asarray(lrk.G[:, :], np.float64)
    G = G - G.mean(0)
    A = lrk.scale * (G.T @ G)
    a, V = np.linalg.eigh(A)
    a = np.maximum(a, 0)
    U_top = (G @ V) * np.where(a > 1e-9, np.sqrt(lrk.scale / np.maximum(a, 1e-9)), 0.0)
    ev_top = np.where(a > 1e-9, a, 0.0) + lrk.eps
    shared_raw = np.c_[W, y].astype(np.float64)
    return (ev_top.astype(dtype), U_top.astype(dtype),
            shared_raw.astype(dtype))


def test_grams_complement_exact_float64(rng):
    """Comp-corrected c-space Grams == explicit full-basis Grams, f64-tight.

    Checks every lambda layout the solver uses: shared scalar, (G,) multi
    grid, and (B,) per-SNP."""
    lrk, G, W, y, X = _case(rng)
    n, pk = lrk.n, lrk.pk
    ev_top, U_top, shared_raw = _implicit_inputs(lrk, W, y, X)
    # K built in float64 end-to-end (lrk.dense() would round through f32
    # and break the 1e-9 tolerance)
    Gc = np.asarray(lrk.G[:, :], np.float64)
    Gc = Gc - Gc.mean(0)
    K = lrk.scale * (Gc @ Gc.T) + lrk.eps * np.eye(n)
    ev_full, U_full = np.linalg.eigh(K)
    ev_full = np.maximum(ev_full, 0)

    sh_f = U_full.T @ shared_raw
    v_f = U_full.T @ X.astype(np.float64)
    sh_c = U_top.T @ shared_raw
    v_c = U_top.T @ X.astype(np.float64)
    s = shared_raw.shape[1]
    B = X.shape[1]

    S_raw = shared_raw.T @ shared_raw
    vS_raw = X.astype(np.float64).T @ shared_raw
    vv_raw = (X.astype(np.float64) ** 2).sum(0)
    comp = GramComplement(
        jnp.float64(lrk.eps), n - pk,
        jnp.asarray(S_raw - sh_c.T @ sh_c),
        jnp.asarray(vS_raw - v_c.T @ sh_c),
        jnp.asarray(vv_raw - (v_c ** 2).sum(0)),
    )

    args_full = (jnp.asarray(ev_full), jnp.asarray(sh_f),
                 pair_products(jnp.asarray(sh_f)), jnp.asarray(v_f),
                 jnp.asarray(v_f * v_f))
    args_impl = (jnp.asarray(ev_top), jnp.asarray(sh_c),
                 pair_products(jnp.asarray(sh_c)), jnp.asarray(v_c),
                 jnp.asarray(v_c * v_c))

    def check(ga, gb, sa, sb):
        for Aa, Ab in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(Aa), np.asarray(Ab),
                                       rtol=1e-9, atol=1e-9)
        for fa, fb in zip(sa, sb):
            np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                       rtol=1e-9, atol=1e-9)

    lam = jnp.float64(3.7)
    check(*_pairup(
        grams_shared_lambda(lam, *args_full, (1, 2, 3), want_logh=True),
        grams_shared_lambda(lam, *args_impl, (1, 2, 3), want_logh=True,
                            comp=comp),
    ))
    lams = jnp.asarray([1e-5, 1e-2, 1.0, 37.0, 1e5], jnp.float64)
    check(*_pairup(
        grams_shared_multi(lams, *args_full, (1, 2), want_logh=True),
        grams_shared_multi(lams, *args_impl, (1, 2), want_logh=True,
                           comp=comp),
    ))
    lam_b = jnp.asarray(rng.uniform(1e-3, 1e3, size=B))
    check(*_pairup(
        grams_per_snp_lambda(lam_b, *args_full, (1, 2, 3), want_logh=True),
        grams_per_snp_lambda(lam_b, *args_impl, (1, 2, 3), want_logh=True,
                             comp=comp),
    ))


def _pairup(out_full, out_impl):
    (ga, sa), (gb, sb) = out_full, out_impl
    return ga, gb, sa, sb


def test_assoc_block_implicit_matches_explicit(rng):
    """Wald/LRT/score stats agree between implicit and full-basis paths."""
    lrk, G, W, y, X = _case(rng)
    n = lrk.n
    cfg = GwasConfig(tests=("wald", "lrt", "score"))
    K = lrk.dense()
    ev, U = np.linalg.eigh(np.asarray(K, np.float64))
    ev = np.maximum(ev, 0).astype(np.float32)
    U = U.astype(np.float32)
    W_r = jnp.asarray(U.T @ W)
    y_r = jnp.asarray(U.T @ y)
    X_r = jnp.asarray(U.T @ X)
    null_e = fit_null(jnp.asarray(ev), W_r, y_r, cfg)
    res_e = assoc_block(jnp.asarray(ev), W_r, y_r, X_r, cfg, null=null_e)

    basis = lowrank_top_basis(lrk)
    U_top = np.asarray(basis.U_top)
    shared_raw = np.c_[W, y].astype(np.float32)
    ictx = ImplicitCtx(
        jnp.float32(lrk.eps), n,
        jnp.asarray(shared_raw.T @ shared_raw),
        jnp.asarray(X.T @ shared_raw),
        jnp.asarray((X * X).sum(0)),
    )
    W_c = jnp.asarray(U_top.T @ W)
    y_c = jnp.asarray(U_top.T @ y)
    C_x = jnp.asarray(U_top.T @ X)
    null_i = fit_null(basis.ev_top, W_c, y_c, cfg, implicit=ictx)
    res_i = assoc_block(basis.ev_top, W_c, y_c, C_x, cfg, null=null_i,
                        implicit=ictx)

    np.testing.assert_allclose(float(null_i.lambda_reml),
                               float(null_e.lambda_reml), rtol=1e-4)
    for k, tol in (("beta", 2e-4), ("se_beta", 1e-4), ("tau", 1e-4),
                   ("lam", 1e-3), ("F_wald", 1e-3)):
        np.testing.assert_allclose(
            np.asarray(getattr(res_i, k)), np.asarray(getattr(res_e, k)),
            rtol=tol, atol=1e-6, err_msg=k)
    lg_i = -np.log10(np.asarray(res_i.p_wald, np.float64))
    lg_e = -np.log10(np.asarray(res_e.p_wald, np.float64))
    assert np.abs(lg_i - lg_e).max() < 0.02
    for k in ("p_lrt", "p_score"):
        lg_i = -np.log10(np.maximum(np.asarray(getattr(res_i, k), np.float64), 1e-300))
        lg_e = -np.log10(np.maximum(np.asarray(getattr(res_e, k), np.float64), 1e-300))
        assert np.abs(lg_i - lg_e).max() < 0.05, k


def test_driver_implicit_default_and_flag(rng):
    """pygemma(K=LowRankKinship) defaults to the implicit path and matches
    the explicit path forced with lowrank_implicit=False, all tests on."""
    lrk, G, W, y, X = _case(rng, p=40)
    cfg = GwasConfig(snp_block=16, tests=("wald", "lrt", "score"))
    df_i = pygemma(y, X, W, lrk, config=cfg)
    df_e = pygemma(y, X, W, lrk, config=cfg.replace(lowrank_implicit=False))
    lg_i = -np.log10(np.asarray(df_i["p_wald"], np.float64))
    lg_e = -np.log10(np.asarray(df_e["p_wald"], np.float64))
    assert np.abs(lg_i - lg_e).max() < 0.05
    np.testing.assert_allclose(df_i["beta"], df_e["beta"], rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(df_i["lambda"], df_e["lambda"], rtol=5e-3)
    for col in ("p_lrt", "p_score"):
        lg_i = -np.log10(np.maximum(np.asarray(df_i[col], np.float64), 1e-300))
        lg_e = -np.log10(np.maximum(np.asarray(df_e[col], np.float64), 1e-300))
        assert np.abs(lg_i - lg_e).max() < 0.1, col


def test_driver_implicit_grid_de_multipheno(rng):
    """grid mode, DE mode and the >=3-phenotype loop all run implicitly."""
    lrk, G, W, y, X = _case(rng, p=30)
    cfg = GwasConfig(snp_block=16)
    df_ig = pygemma(y, X, W, lrk, config=cfg, grid=True)
    df_eg = pygemma(y, X, W, lrk, config=cfg.replace(lowrank_implicit=False),
                    grid=True)
    np.testing.assert_allclose(df_ig["lambda"], df_eg["lambda"])

    df_ide = pygemma(y, X, W, lrk, config=cfg, de=True)
    df_ede = pygemma(y, X, W, lrk,
                     config=cfg.replace(lowrank_implicit=False), de=True)
    np.testing.assert_allclose(df_ide["beta"], df_ede["beta"], rtol=5e-3,
                               atol=1e-5)

    rng2 = np.random.default_rng(5)
    Y3 = np.stack([y, y + 0.1 * rng2.standard_normal(lrk.n).astype(np.float32),
                   rng2.standard_normal(lrk.n).astype(np.float32)], axis=1)
    df3_i = pygemma(Y3, X, W, lrk, config=cfg)
    df3_e = pygemma(Y3, X, W, lrk,
                    config=cfg.replace(lowrank_implicit=False))
    assert "pheno" in df3_i.columns and len(df3_i) == 3 * X.shape[1]
    np.testing.assert_allclose(df3_i["beta"], df3_e["beta"], rtol=2e-3,
                               atol=1e-5)


def test_driver_implicit_checkpoint_resume(rng, tmp_path):
    """run_dir checkpointing works on the implicit path: the eigen basis and
    completed blocks are reused on resume with identical results."""
    lrk, G, W, y, X = _case(rng, p=48)
    cfg = GwasConfig(snp_block=16)
    run_dir = str(tmp_path / "impl_run")
    df1 = pygemma(y, X, W, lrk, config=cfg, run_dir=run_dir)
    # resume: everything (eigen + all blocks) comes from the checkpoint
    from pygemma_tpu import api as api_mod

    api_mod._EIGEN_DEV_CACHE.clear()
    df2 = pygemma(y, X, W, lrk, config=cfg, run_dir=run_dir)
    np.testing.assert_allclose(df1["beta"], df2["beta"], rtol=0, atol=0)
    np.testing.assert_allclose(df1["p_wald"], df2["p_wald"], rtol=0, atol=0)


def test_fused_kernel_with_complement(rng):
    """The Pallas fused Gram kernel composes with the complement correction
    (interpret mode on CPU) and matches the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    lrk, G, W, y, X = _case(rng, n=96, pk=24, p=8)
    n, pk = lrk.n, lrk.pk
    ev_top, U_top, shared_raw = _implicit_inputs(lrk, W, y, X,
                                                 dtype=np.float32)
    sh_c = (U_top.T @ shared_raw).astype(np.float32)
    v_c = (U_top.T @ X).astype(np.float32)
    S_raw = (shared_raw.T @ shared_raw).astype(np.float32)
    vS_raw = (X.T @ shared_raw).astype(np.float32)
    vv_raw = (X * X).sum(0).astype(np.float32)
    comp = GramComplement(
        jnp.float32(lrk.eps), n - pk,
        jnp.asarray(S_raw - sh_c.T @ sh_c),
        jnp.asarray(vS_raw - v_c.T @ sh_c),
        jnp.asarray(vv_raw - (v_c ** 2).sum(0)),
    )
    lam = jnp.asarray(rng.uniform(0.1, 10.0, size=X.shape[1]), jnp.float32)
    args = (jnp.asarray(ev_top.astype(np.float32)), jnp.asarray(sh_c),
            pair_products(jnp.asarray(sh_c)), jnp.asarray(v_c))
    g_ref, s_ref = grams_per_snp_lambda(
        lam, args[0], args[1], args[2], args[3], jnp.asarray(v_c * v_c),
        (1, 2), want_logh=True, comp=comp)
    from pygemma_tpu.core.grams import grams_per_snp_lambda_fused

    with pltpu.force_tpu_interpret_mode():
        g_fu, s_fu = grams_per_snp_lambda_fused(
            lam, args[0], args[1], args[2], args[3], (1, 2),
            want_logh=True, comp=comp)
    for Aa, Ab in zip(g_ref, g_fu):
        np.testing.assert_allclose(np.asarray(Aa), np.asarray(Ab),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_ref.sum_d),
                               np.asarray(s_fu.sum_d), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_ref.sum_logh),
                               np.asarray(s_fu.sum_logh), rtol=1e-4)


_MULTIPHENO_CHILD = """
import sys, numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, sys.argv[3])
from pygemma_tpu import GwasConfig, LowRankKinship, pygemma

d = np.load(sys.argv[1])
lrk = LowRankKinship(d["G"], eps=1e-3)
cfg = GwasConfig(snp_block=16, tests=("wald", "lrt", "score"))
df_i = pygemma(d["Y3"], d["X"], d["W"], lrk, config=cfg)
df_e = pygemma(d["Y3"], d["X"], d["W"], lrk,
               config=cfg.replace(lowrank_implicit=False))
cols = ("beta", "p_wald", "p_lrt", "p_score")
np.savez(sys.argv[2], **{f"i_{c}": df_i[c].to_numpy() for c in cols},
         **{f"e_{c}": df_e[c].to_numpy() for c in cols})
"""


def test_driver_implicit_multipheno_lrt_score(rng, tmp_path):
    """>=3 phenotypes + LRT/score route through the batched implicit scan
    (factored raw Grams; genotypes stream once for all phenotypes) and
    match the explicit full-basis path.

    Runs in a SUBPROCESS: compiling this vmapped multi-phenotype graph
    in-process leaves XLA:CPU's compiler in a state that segfaults a later
    unrelated compile (reproduced twice at the same suite position,
    vanishes when this test is deselected) -- an upstream jaxlib issue the
    isolation sidesteps without losing the coverage."""
    import subprocess as sp

    lrk, G, W, y, X = _case(rng, p=30)
    rng2 = np.random.default_rng(11)
    Y3 = np.stack([
        y,
        (0.5 * y + rng2.standard_normal(lrk.n)).astype(np.float32),
        rng2.standard_normal(lrk.n).astype(np.float32),
    ], axis=1)
    inp = str(tmp_path / "in.npz")
    outp = str(tmp_path / "out.npz")
    np.savez(inp, G=G, W=W, X=X, Y3=Y3)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = sp.run([sys.executable, "-c", _MULTIPHENO_CHILD, inp, outp, repo],
               capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    d = np.load(outp)
    np.testing.assert_allclose(d["i_beta"], d["e_beta"], rtol=2e-3,
                               atol=1e-5)
    for col in ("p_wald", "p_lrt", "p_score"):
        lg_i = -np.log10(np.maximum(d[f"i_{col}"].astype(np.float64),
                                    1e-300))
        lg_e = -np.log10(np.maximum(d[f"e_{col}"].astype(np.float64),
                                    1e-300))
        assert np.abs(lg_i - lg_e).max() < 0.1, col


def test_top_basis_respool_matches_resident(rng):
    """At large n the (n, p_k) float32 G is dropped before the Gram eigh
    and re-streamed after (HBM headroom at n=50k); forcing that path at
    test scale must give the identical basis."""
    lrk, G, W, y, X = _case(rng, n=120, pk=32)
    b_res = lowrank_top_basis(lrk)
    b_rsp = lowrank_top_basis(lrk, respool_bytes=0)  # force the re-stream
    np.testing.assert_allclose(np.asarray(b_rsp.ev_top),
                               np.asarray(b_res.ev_top), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(b_rsp.U_top),
                               np.asarray(b_res.U_top), rtol=0, atol=0)


def test_constant_snp_yields_nan_not_false_positive(rng):
    """An exactly-collinear SNP (constant column, W=intercept) must come
    out as a NaN row -- the reference's singular-design contract
    (lmm/lmm.py:484-493) -- never as beta=inf / p=0.  On the implicit path
    x'P_c x cancels to exactly zero, which previously emitted p = 0."""
    lrk, G, W, y, X = _case(rng, n=150, pk=40, p=24)
    X = X.copy()
    X[:, 5] = 1.0  # constant column == intercept direction
    cfg = GwasConfig(snp_block=12)
    for c in (None,):  # intercept-only design
        df_i = pygemma(y, X, c, lrk, config=cfg)
        df_e = pygemma(y, X, c, lrk,
                       config=cfg.replace(lowrank_implicit=False))
        for df in (df_i, df_e):
            assert not np.isfinite(df["beta"][5]) or \
                np.asarray(df["p_wald"])[5] > 1e-10, \
                "collinear SNP produced a significant p-value"
        # the other lanes are unaffected
        m = np.ones(24, bool)
        m[5] = False
        lg_i = -np.log10(np.asarray(df_i["p_wald"], np.float64)[m])
        lg_e = -np.log10(np.asarray(df_e["p_wald"], np.float64)[m])
        assert np.abs(lg_i - lg_e).max() < 0.05
