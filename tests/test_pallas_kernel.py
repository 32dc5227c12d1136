"""Fused Pallas Gram kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pygemma_tpu.core.grams import (
    grams_per_snp_lambda,
    grams_per_snp_lambda_fused,
    pair_products,
)


@pytest.mark.parametrize("n,B,c", [(300, 40, 3), (70, 10, 1), (515, 130, 6)])
@pytest.mark.parametrize("want_logh", [False, True])
def test_fused_matches_xla(n, B, c, want_logh):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(n * 1000 + B)  # order-independent data
    ev = np.abs(rng.normal(size=n)).astype(np.float32)
    W = rng.normal(size=(n, c)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    X = rng.normal(size=(n, B)).astype(np.float32)
    lam = np.power(10.0, rng.uniform(-4, 4, size=B)).astype(np.float32)

    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    grams_ref, sums_ref = grams_per_snp_lambda(
        jnp.asarray(lam), jnp.asarray(ev), shared, pairs, v, v * v,
        (1, 2, 3), want_logh=want_logh,
    )
    with pltpu.force_tpu_interpret_mode():
        grams_f, sums_f = grams_per_snp_lambda_fused(
            jnp.asarray(lam), jnp.asarray(ev), shared, pairs,
            jnp.asarray(X), (1, 2, 3), want_logh=want_logh,
        )
    # The kernel computes its dots in split bf16x3 precision (~2^-16
    # operand rounding, f32 accumulation); error scales with the magnitude
    # of the summands, so compare with a norm-scaled atol.
    for k in range(3):
        ref_k = np.asarray(grams_ref[k])
        np.testing.assert_allclose(
            np.asarray(grams_f[k]), ref_k,
            rtol=2e-4, atol=3e-4 * np.abs(ref_k).max(),
        )
    np.testing.assert_allclose(sums_f.sum_d, sums_ref.sum_d, rtol=1e-5)
    np.testing.assert_allclose(sums_f.sum_d2, sums_ref.sum_d2, rtol=1e-5)
    if want_logh:
        np.testing.assert_allclose(sums_f.sum_logh, sums_ref.sum_logh,
                                   rtol=1e-5, atol=1e-5)


def test_fused_multi_slot_matches_single(rng=None):
    """2-D lambda (root slots) must equal two independent 1-D evaluations."""
    from jax.experimental.pallas import tpu as pltpu

    from pygemma_tpu.core.grams import grams_per_snp_lambda_slots

    rng = np.random.default_rng(99)
    n, B, c = 260, 24, 2
    ev = np.abs(rng.normal(size=n)).astype(np.float32)
    W = rng.normal(size=(n, c)).astype(np.float32)
    y = rng.normal(size=n).astype(np.float32)
    X = rng.normal(size=(n, B)).astype(np.float32)
    lam2 = np.power(10.0, rng.uniform(-3, 3, size=(B, 2))).astype(np.float32)

    shared = jnp.asarray(np.c_[W, y])
    pairs = pair_products(shared)
    v = jnp.asarray(X)
    g_ref, s_ref = grams_per_snp_lambda_slots(
        jnp.asarray(lam2), jnp.asarray(ev), shared, pairs, v, v * v,
        (1, 2, 3), want_logh=True,
    )
    with pltpu.force_tpu_interpret_mode():
        g_f, s_f = grams_per_snp_lambda_fused(
            jnp.asarray(lam2), jnp.asarray(ev), shared, pairs,
            jnp.asarray(X), (1, 2, 3), want_logh=True,
        )
    for k in range(3):
        ref_k = np.asarray(g_ref[k])
        np.testing.assert_allclose(np.asarray(g_f[k]), ref_k,
                                   rtol=2e-4, atol=3e-4 * np.abs(ref_k).max())
    np.testing.assert_allclose(s_f.sum_d, s_ref.sum_d, rtol=1e-5)
    np.testing.assert_allclose(s_f.sum_logh, s_ref.sum_logh, rtol=1e-5,
                               atol=1e-5)


def test_multi_phenotype_unrolled_fused_matches_vmap():
    """assoc_block_multi's trace-time-unrolled fused path (k <= _MULTI_UNROLL)
    must match the vmapped XLA path.

    Pallas interpret mode executes the kernel per-element in Python, so the
    full default solver (11 decade points x 6 bisection + 10 Newton masked
    iterations x 2 root slots) is far too slow to run under it -- the round-1
    version of this test hung the suite.  A 1-iteration / 1-root / 5-decade
    config exercises exactly the same unrolled-fused vs vmapped-XLA code
    paths at ~1% of the interpret-mode cost.
    """
    from jax.experimental.pallas import tpu as pltpu

    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core import assoc

    rng = np.random.default_rng(7)
    n, B, c, k = 64, 8, 2, 2
    ev = np.abs(rng.normal(size=n)).astype(np.float32)
    W = np.c_[np.ones(n), rng.normal(size=(n, c - 1))].astype(np.float32)
    Y = rng.normal(size=(k, n)).astype(np.float32)
    X = rng.normal(size=(n, B)).astype(np.float32)
    cfg = GwasConfig(
        snp_block=B, bisect_iters=1, newton_iters=1, max_roots=1,
        lambda_pow_low=-2.0, lambda_pow_high=2.0,
    )

    ref = assoc.assoc_block_multi(
        jnp.asarray(ev), jnp.asarray(W), jnp.asarray(Y), jnp.asarray(X),
        cfg.replace(use_fused_kernel=False),
    )
    with pltpu.force_tpu_interpret_mode():
        got = assoc.assoc_block_multi(
            jnp.asarray(ev), jnp.asarray(W), jnp.asarray(Y), jnp.asarray(X),
            cfg.replace(use_fused_kernel=True),
        )
    assert set(got) == set(ref)
    for key in ("beta", "se_beta", "lam", "F_wald"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), rtol=2e-3, atol=1e-6
        )
