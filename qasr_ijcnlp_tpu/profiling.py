"""Tracing and per-step timing.

The reference's only progress visibility is tqdm bars and prints
(SURVEY.md §5).  The TPU-native replacements:

* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (XLA op timeline, HBM usage) for any region;
* :class:`StepTimer` — device-synchronized wall-clock stats per named step,
  with jitted-step-friendly ``block_until_ready`` handling;
* :func:`annotate` — ``TraceAnnotation`` wrapper so host-side phases show up
  in the device trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qasr_profile"):
    """Capture a jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that appears on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates device-synchronized timings per step name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def step(self, name: str, result_holder: Optional[list] = None):
        import jax.numpy as jnp

        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder[-1])
        else:
            # No holder: flush the device queue anyway (programs execute in
            # order), otherwise this records only async-dispatch time — a
            # 300 ms step would report as sub-millisecond.
            jax.block_until_ready(jnp.zeros(()))
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its output, record the wall time, return output."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self, log=print):
        for name, s in sorted(self.summary().items()):
            log(f"{name:<28} {s['count']:>6} x {s['mean_ms']:9.2f} ms "
                f"= {s['total_s']:8.2f} s")
