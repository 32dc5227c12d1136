"""Stage profile of the host-driven D&C eigh on the bench's Gram shape.

Round-5 target (VERDICT r04 next-#2): the warm 16,384^2 Gram eigh is 32.7 s
= 63% of the warm 20k end-to-end; this script reproduces exactly that
eigh (same matrix character: scaled Gram of standardized SNP columns,
Marchenko-Pastur bulk) and prints the per-stage breakdown that
``PYGEMMA_TPU_DC_VERBOSE=1`` emits, with real tunnel syncs.

Usage:  python benchmarks/profile_eigh_dc.py [n] [pk]
"""

import os
import sys
import time

os.environ.setdefault("PYGEMMA_TPU_DC_VERBOSE", "1")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pygemma_tpu.api import _enable_compile_cache  # noqa: E402
from pygemma_tpu.core.eigh_dc import eigh_dc  # noqa: E402
from pygemma_tpu.core.lowrank import _gram_scaled  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    pk = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    reps = int(os.environ.get("REPS", "2"))
    _enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')} | "
          f"Gram of standardized ({n}, {pk}) SNP block")

    G = jax.random.normal(jax.random.PRNGKey(0), (n, pk), dtype=jnp.float32)
    A, _ = _gram_scaled(G, jnp.float32(1.0 / pk), True)
    del G
    float(jnp.sum(A))  # force build before timing

    # SAME seed every rep: the split rank r_lo fixes every downstream
    # executable shape, so rep 0 is the cold pass and later reps measure
    # the true warm recurring cost (a varying seed changes r_lo by a few
    # and every shape-dependent executable recompiles -- measured 40-265 s
    # first-materialization penalties per rep through this tunnel).
    for r in range(reps):
        t0 = time.time()
        ev, U = eigh_dc(A, seed=0)
        s = float(jnp.sum(ev) + jnp.sum(U[0]))  # real sync through tunnel
        dt = time.time() - t0
        print(f"[rep {r}] eigh_dc({pk}) total {dt:.1f}s (sync {s:.3f})",
              flush=True)
        # residual spot check on the last rep
        if r == reps - 1:
            i = jnp.arange(0, pk, max(1, pk // 64))
            Ui = U[:, i]
            R = jnp.dot(A, Ui, precision=jax.lax.Precision.HIGHEST) \
                - Ui * ev[i][None, :]
            rel = float(jnp.max(jnp.abs(R)) / jnp.max(jnp.abs(ev)))
            print(f"residual (64 sampled cols): {rel:.2e}")
        # free before the next rep: a retained (pk, pk) basis plus the
        # next rep's live set pushes the leaf eigh scratch past HBM
        del ev, U


if __name__ == "__main__":
    main()
