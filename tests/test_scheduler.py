"""Job-DAG scheduler: ordering, device serialization, resume, errors."""

import threading
import time

import pytest

from commet_tpu.engine.scheduler import JobGraph


def test_dependency_order():
    order = []
    g = JobGraph(workers=4)
    g.add("a", lambda: order.append("a"))
    g.add("b", lambda: order.append("b"), deps=["a"])
    g.add("c", lambda: order.append("c"), deps=["a"])
    g.add("d", lambda: order.append("d"), deps=["b", "c"])
    g.run()
    assert order[0] == "a"
    assert order[-1] == "d"
    assert set(order) == {"a", "b", "c", "d"}


def test_device_jobs_serialize():
    active = []
    max_active = []
    lock = threading.Lock()

    def dev_job():
        with lock:
            active.append(1)
            max_active.append(len(active))
        time.sleep(0.05)
        with lock:
            active.pop()

    g = JobGraph(workers=4)
    for i in range(6):
        g.add(f"d{i}", dev_job, device=True)
    g.run()
    assert max(max_active) == 1  # never two device jobs at once


def test_done_check_skips():
    ran = []
    g = JobGraph(workers=2)
    g.add("skipped", lambda: ran.append("x"), done_check=lambda: True)
    g.add("runs", lambda: ran.append("y"), deps=["skipped"])
    g.run()
    assert ran == ["y"]


def test_error_propagates():
    def boom():
        raise ValueError("nope")

    g = JobGraph(workers=2)
    g.add("bad", boom)
    g.add("after", lambda: None, deps=["bad"])
    with pytest.raises(RuntimeError):
        g.run()


def test_unknown_dep_rejected():
    g = JobGraph()
    g.add("a", lambda: None, deps=["ghost"])
    with pytest.raises(ValueError):
        g.run()
