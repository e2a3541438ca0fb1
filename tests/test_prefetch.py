"""prefetch_map: ordering, exception propagation, and actual overlap."""

import threading
import time

import pytest

from gens_tpu.utils.prefetch import prefetch_map


def test_order_preserved():
    out = list(prefetch_map(lambda x: x * 2, list(range(20)), depth=3))
    assert out == [x * 2 for x in range(20)]


def test_depth_zero_is_plain_map():
    out = list(prefetch_map(lambda x: x + 1, [1, 2, 3], depth=0))
    assert out == [2, 3, 4]


def test_exception_surfaces_at_yield():
    def fn(x):
        if x == 2:
            raise ValueError("boom")
        return x

    it = prefetch_map(fn, [0, 1, 2, 3], depth=2)
    assert next(it) == 0
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_overlap():
    """With a slow producer and a slow consumer, total wall time must be
    clearly below the serial sum (the whole point of the pipeline)."""
    d = 0.05

    def produce(i):
        time.sleep(d)
        return i

    n = 8
    t0 = time.time()
    for _ in prefetch_map(produce, list(range(n)), depth=2):
        time.sleep(d)  # consumer work (the train step)
    elapsed = time.time() - t0
    serial = 2 * d * n
    assert elapsed < serial * 0.8, f"{elapsed:.3f}s vs serial {serial:.3f}s"


def test_threads_are_reaped():
    before = threading.active_count()
    list(prefetch_map(lambda x: x, list(range(10)), depth=2))
    # executor context exits -> workers joined
    assert threading.active_count() <= before + 1
