"""Profiling hooks: JAX device traces + host cProfile.

Reference equivalents: cProfile dumps around single kernel calls
(tests/profile_pygemma.py:242-249) and whole-run cProfile / pyinstrument
recipes (tests/profile.sh:14-21).  On TPU the useful artifact is a
jax.profiler trace (viewable in TensorBoard / Perfetto); host cProfile is
kept for driver-side overhead.
"""

from __future__ import annotations

import contextlib
import cProfile
import pstats
import io
import os
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/pygemma_tpu_trace"):
    """Capture an XLA device trace around a block of work."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def host_profile(sort: str = "cumtime", top: int = 30, stream=None):
    """cProfile a host-side block and print the hottest entries."""
    pr = cProfile.Profile()
    pr.enable()
    try:
        yield pr
    finally:
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats(sort).print_stats(top)
        print(s.getvalue(), file=stream)


class StageTimer:
    """Accumulate named wall-time buckets (reference's rich stage timings,
    lmm/lmm.py:144-163, as a reusable object)."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.2f}s" for k, v in self.totals.items())
