"""Pipelined stage executor (SURVEY §2 'pipeline parallelism across
stages'): overlap, ordering, error propagation, bounded lookahead."""

import threading
import time

import pytest

from multiviewstitch_tpu.pipeline.executor import prefetch_map, StagePipeline


def test_prefetch_preserves_order_and_results():
    out = list(prefetch_map(lambda x: x * x, range(17), depth=3))
    assert out == [x * x for x in range(17)]


def test_prefetch_overlaps_producer_with_consumer():
    """Producer (0.05s) and consumer (0.05s) per item: pipelined wall time
    must be well under the serial sum."""
    n = 8

    def produce(i):
        time.sleep(0.05)
        return i

    t0 = time.perf_counter()
    total = 0
    for x in prefetch_map(produce, range(n), depth=2):
        time.sleep(0.05)          # consumer work
        total += x
    wall = time.perf_counter() - t0
    assert total == sum(range(n))
    serial = n * 0.10
    assert wall < serial * 0.75, (wall, serial)


def test_prefetch_bounded_lookahead():
    """No more than `depth` producers may run ahead of the consumer."""
    in_flight = []
    lock = threading.Lock()
    max_ahead = [0]
    consumed = [0]

    def produce(i):
        with lock:
            ahead = i - consumed[0]
            max_ahead[0] = max(max_ahead[0], ahead)
        time.sleep(0.01)
        return i

    for x in prefetch_map(produce, range(20), depth=2):
        with lock:
            consumed[0] = x
        time.sleep(0.01)
    # allow depth + the one being yielded
    assert max_ahead[0] <= 2 + 1, max_ahead[0]


def test_prefetch_propagates_exceptions_in_order():
    def produce(i):
        if i == 3:
            raise ValueError("boom at 3")
        return i

    got = []
    with pytest.raises(ValueError, match="boom at 3"):
        for x in prefetch_map(produce, range(6), depth=2):
            got.append(x)
    assert got == [0, 1, 2]


def test_stage_pipeline_runs_consumer_on_caller_thread():
    caller = threading.get_ident()
    seen = []

    pipe = StagePipeline(producer=lambda i: i + 1,
                         consumer=lambda x: (seen.append(
                             threading.get_ident()), x * 2)[1])
    out = pipe.run(range(5))
    assert out == [2, 4, 6, 8, 10]
    assert all(t == caller for t in seen)
