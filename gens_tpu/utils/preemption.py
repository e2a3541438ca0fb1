"""Preemption-aware training (failure detection / elastic recovery).

Cloud TPU VMs deliver SIGTERM shortly before eviction. Catching it lets the
train loop write a final checkpoint and exit cleanly; ``--resume auto`` then
continues from that checkpoint on the replacement VM. The reference has no
recovery story at all (no try/except around training, plain
torch.distributed.launch — SURVEY §5 "Failure detection: none"); this plus
the non-finite-loss emergency checkpoint (runner._flush_metrics) is the
TPU build's equivalent of an elastic agent.

Multi-host: each process sees its own signal at a slightly different step,
but a checkpoint save is COLLECTIVE under orbax — every process must enter
it at the same step or the job deadlocks at eviction. ``requested_global``
agrees across hosts (any-host OR via process_allgather); call it only at
synchronized points (log/epoch boundaries), never per step.
"""

from __future__ import annotations

import signal
import threading
from typing import Tuple


class PreemptionGuard:
    """Installs signal handlers (main thread only) that set a flag instead
    of killing the process. Use as a context manager so the previous
    handlers are restored (pytest installs its own)."""

    def __init__(self, signals: Tuple[int, ...] = (signal.SIGTERM,)):
        self._flag = threading.Event()
        self._signals = signals
        self._prev = {}

    def __enter__(self):
        for s in self._signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev.clear()
        return False

    def _handler(self, signum, frame):
        self._flag.set()

    def trigger(self):
        """Set the flag programmatically (tests; cooperative shutdown)."""
        self._flag.set()

    @property
    def requested(self) -> bool:
        """This process's local flag — correct for single-process runs."""
        return self._flag.is_set()

    def requested_global(self) -> bool:
        """Cross-host agreement: True once ANY host was signalled. Collective
        (all hosts must call it together) — only use at sync points."""
        import jax

        if jax.process_count() == 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(self._flag.is_set(), np.int32))
        return bool(np.asarray(flags).any())
