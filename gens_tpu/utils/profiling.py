"""Profiling / tracing hooks — a subsystem the reference lacks entirely
(SURVEY.md §5: "Tracing/profiling: none"). Provides:

* ``trace(logdir)``: context manager around ``jax.profiler`` traces
  (view in TensorBoard / Perfetto);
* ``phase_timer``: lightweight wall-clock phase accounting with device
  sync, for step-level breakdowns without a full trace;
* ``device_memory_stats``: live HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; ``sync=True`` fences the
    device so timings are honest."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.time()
        yield
        if self.sync and sync_value is not None:
            jax.block_until_ready(sync_value)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in self.totals}

    def report(self) -> str:
        lines = [f"  {k}: {v * 1e3:.1f} ms/call ({self.counts[k]} calls)"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)


def device_memory_stats() -> Optional[Dict[str, float]]:
    """Per-device HBM usage in GB (None if the backend doesn't report)."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if not stats:
            return None
        return {
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2 ** 30,
            "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2 ** 30,
            "bytes_limit_gb": stats.get("bytes_limit", 0) / 2 ** 30,
        }
    except Exception:
        return None
