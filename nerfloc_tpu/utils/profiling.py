"""Tracing / profiling utilities.

The reference's only instrumentation is an ad-hoc time.time() pair around
render_image (reference: nerf_pose_estimator.py:377-381). Here:
  - PhaseTimer: named phase accumulation with device fencing,
  - trace(): context manager around jax.profiler for XLA-level traces
    (view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; fences the device by default
    (on remote-TPU transports block_until_ready may not wait — callers
    passing `fence_value` get a host fetch as the fence)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "\n".join(f"{k:30s} {v:8.3f}s  x{self.counts[k]}"
                         for k, v in rows)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
