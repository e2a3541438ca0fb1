"""Background-thread input prefetch.

The reference hides host I/O behind a torch DataLoader with 8 workers
(/root/reference/datasets/__init__.py:37). Here the equivalent is a small
look-ahead pipeline: worker threads decode scene i+1..i+depth while the
device runs step i. Threads (not processes) suffice because the heavy work
— PNG/PFM decode in PIL/numpy/cv2 — releases the GIL, and jax dispatch is
async anyway.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence


def prefetch_map(fn: Callable, items: Sequence, depth: int = 2,
                 workers: int = 2) -> Iterator:
    """Yield ``fn(item)`` for each item, computing up to ``depth`` items
    ahead on worker threads. Exceptions surface at the corresponding yield.

    Equivalent ordering to ``map(fn, items)``; with depth=0 it degrades to
    exactly that (no threads).
    """
    if depth <= 0:
        for it in items:
            yield fn(it)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futures = []
        n = len(items)
        for i in range(min(depth, n)):
            futures.append(ex.submit(fn, items[i]))
        for i in range(n):
            out = futures[i].result()
            nxt = i + depth
            if nxt < n:
                futures.append(ex.submit(fn, items[nxt]))
            yield out
