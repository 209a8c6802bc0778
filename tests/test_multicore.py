"""Tests for the multiprocess parallel primitives (behaviors from the
upstream ``tests/test_multicore.py`` + ``tests/test_commands.py``)."""
import os
import tempfile
from multiprocessing import Queue

import pytest

from atropos_tpu.commands.multicore import (
    OrderPreservingWriterResultHandler,
    dequeue,
    enqueue,
    wait_on,
)
from atropos_tpu.commands.trim.writers import Writers


class TimeoutException(Exception):
    pass


def test_wait_on():
    class Callbacks:
        def __init__(self):
            self.i = 0
            self.j = 0

        def condition(self):
            self.i += 1
            return self.i >= 5

        def fail_callback(self):
            self.j += 1

    cb = Callbacks()
    wait_on(cb.condition, wait_message="waiting", fail_callback=cb.fail_callback)
    assert cb.i == 5
    assert cb.j == 4


def test_timeout():
    with pytest.raises(TimeoutException):
        wait_on(
            lambda: False, timeout=2, wait=1, timeout_callback=TimeoutException
        )


def test_enqueue_dequeue():
    queue = Queue(1)
    enqueue(queue, 1)
    assert dequeue(queue) == 1


def test_enqueue_timeout():
    with pytest.raises(TimeoutException):
        queue = Queue(1)
        queue.put(1)
        enqueue(queue, 2, timeout=1, block_timeout=2, timeout_callback=TimeoutException)


def test_dequeue_timeout():
    with pytest.raises(TimeoutException):
        dequeue(Queue(1), timeout=1, block_timeout=2, timeout_callback=TimeoutException)


def test_order_preserving_writer():
    path = tempfile.mkstemp()[1]
    try:
        writers = Writers()
        handler = OrderPreservingWriterResultHandler(writers)
        handler.start(None)
        handler.write_result(2, {path: "result2"})
        handler.write_result(3, {path: "result3"})
        handler.write_result(1, {path: "result1"})
        handler.finish(total_batches=3)
        with open(path, "rt") as inp:
            assert inp.read() == "result1result2result3"
    finally:
        os.remove(path)
