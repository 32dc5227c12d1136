"""Stage-level TPU timing of the association scan (design doc input).

Breaks one SNP-block step into measurable stages, each timed with
block_until_ready over several repeats:

  rot       U'X rotation GEMM (Precision.HIGH bf16x3)
  sweep     stage-1 decade sweep of d1 (shared-lambda wide-GEMM path)
  grid      full grid-mode solve (sweep + argmax likelihoods)
  solve     full lambda solve (sweep + compacted bisection/Newton/lik)
  wald      final statistics Gram at lambda* + beta/se/F
  step      the whole assoc_block (solve + wald)

Usage: python benchmarks/profile_stages.py [n] [p] [block]
Writes one JSON line per config to stderr-free stdout for the design doc.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_timer(inputs):
    """Stage timer that is honest over the axon tunnel.

    ``jax.block_until_ready`` does NOT wait for remote execution on this
    backend (verified: a 13.6 ms GEMM 'completes' in 0.1 ms under it), so a
    stage is timed by dispatching k executions on k DISTINCT pre-staged
    inputs and forcing completion with ONE host pull of a scalar that
    depends on every output; the single-dispatch time is subtracted out.
    """
    import jax.numpy as jnp

    def timed(scalar_fn, repeats=8):
        def run(k):
            t0 = time.time()
            outs = [scalar_fn(inputs[i % len(inputs)]) for i in range(k)]
            s = outs[0]
            for o in outs[1:]:
                s = s + o
            float(s)
            return time.time() - t0

        run(1)  # compile + first-materialization warmup
        run(1)
        t1 = min(run(1), run(1))
        tk = run(repeats)
        return (tk - t1) / (repeats - 1)

    return timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    import jax
    import jax.numpy as jnp

    from pygemma_tpu.api import _enable_compile_cache
    from pygemma_tpu.config import GwasConfig
    from pygemma_tpu.core.assoc import assoc_block, _use_fused
    from pygemma_tpu.core.grams import pair_products
    from pygemma_tpu.core.solver import LambdaProblem, evaluate, solve_lambda

    _enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev} n={n} p={p} B={B}", file=sys.stderr)

    # Rotated-space data constructed directly (no O(n^3) QR/eigh on this
    # 2-core host): a realistic GRM-like spectrum, y built under the LMM
    # with h2=0.5 so lambda* ~ O(1) and the refinement stages run their
    # typical iteration counts; the rotation GEMM cost is value-independent.
    rng = np.random.default_rng(0)
    ev_h = np.sort(rng.gamma(0.6, 1.6, size=n)).astype(np.float32)
    W_r_h = np.c_[np.ones(n), rng.standard_normal((n, 2))].astype(np.float32)
    y_r_h = (np.sqrt(0.5 * ev_h + 0.5)
             * rng.standard_normal(n)).astype(np.float32)
    Xr_h = rng.standard_normal((n, B)).astype(np.float32)
    U_h = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)

    U = jax.device_put(U_h, dev)
    ev = jax.device_put(ev_h, dev)
    G_dev = jax.device_put(Xr_h, dev)  # rotation-GEMM operand
    cfg = GwasConfig(snp_block=B)

    rot = jax.jit(lambda U, X: jnp.dot(U.T, X,
                                       precision=jax.lax.Precision.HIGH))
    W_r = jnp.asarray(W_r_h)
    y_r = jnp.asarray(y_r_h)
    Xr = jnp.asarray(Xr_h)
    jax.block_until_ready((W_r, y_r, Xr))

    fused = _use_fused(cfg, jnp.float32)
    shared = jnp.concatenate([W_r, y_r[:, None]], axis=1)
    pairs = pair_products(shared)
    decades = jnp.asarray(
        [10.0 ** e for e in range(-5, 6)], jnp.float32)

    # distinct pre-staged genotype blocks so repeated dispatches cannot be
    # deduplicated anywhere in the pipeline.  Every array reaches jit as an
    # ARGUMENT, never a closure: the remote-compile channel serializes
    # closure constants (a closed-over U is a 400 MB compile request).
    n_inputs = 4
    inputs = [jax.device_put(
        rng.standard_normal((n, B)).astype(np.float32), dev)
        for _ in range(n_inputs)]
    timed = make_timer(inputs)

    def prob_of(ev, shared, pairs, X):
        return LambdaProblem(ev, shared, pairs, X, X * X, n,
                             W_r_h.shape[1] + 1, True, True, fused)

    stages = {}
    rot_sum = jax.jit(lambda U, X: jnp.sum(rot(U, X)))
    stages["rot"] = timed(lambda X: rot_sum(U, X))

    sweep = jax.jit(lambda e, sh, pr, X: jnp.sum(
        evaluate(prob_of(e, sh, pr, X), decades, "d1", "multi")))
    stages["sweep"] = timed(lambda X: sweep(ev, shared, pairs, X))

    solve_grid = jax.jit(lambda e, sh, pr, X: sum(
        jnp.sum(o) for o in
        solve_lambda(prob_of(e, sh, pr, X), cfg.replace(grid=True))))
    stages["grid"] = timed(lambda X: solve_grid(ev, shared, pairs, X))

    solve_full = jax.jit(lambda e, sh, pr, X: sum(
        jnp.sum(o) for o in solve_lambda(prob_of(e, sh, pr, X), cfg)))
    stages["solve"] = timed(lambda X: solve_full(ev, shared, pairs, X))

    step = jax.jit(lambda e, Wr, yr, X: sum(
        jnp.sum(o) for o in assoc_block(e, Wr, yr, X, cfg)[:5]))
    stages["step"] = timed(lambda X: step(ev, W_r, y_r, X))

    stages["wald"] = stages["step"] - stages["solve"]
    stages["refine"] = stages["solve"] - stages["sweep"]
    per_block = stages["rot"] + stages["step"]
    out = {
        "n": n, "B": B, "fused": fused,
        **{k: round(v * 1000, 2) for k, v in stages.items()},
        "unit": "ms/block",
        "snps_per_sec": round(B / per_block, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
