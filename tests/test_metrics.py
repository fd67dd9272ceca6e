"""Serving metrics (reference EKG surface, Metrics.hs:43-78): counter
increments before the action (errors still count), latency distribution
stats, thread-safety."""

import threading

import pytest

from hayoo_spark.query.metrics import Metric, MetricsStore


def test_counter_counts_errors_too():
    m = Metric()
    with pytest.raises(ValueError):
        with m.measure():
            raise ValueError("boom")
    st = m.stats()
    assert st["count"] == 1  # counted regardless of errors (Metrics.hs:59)
    assert st["sum"] == 0.0  # but no latency recorded for the failure


def test_distribution_stats():
    m = Metric()
    for v in (0.1, 0.2, 0.3, 0.4):
        m.inc()
        m.add(v)
    st = m.stats()
    assert st["count"] == 4
    assert abs(st["mean"] - 0.25) < 1e-12
    assert st["min"] == 0.1 and st["max"] == 0.4
    assert abs(st["sum"] - 1.0) < 1e-12
    assert abs(st["variance"] - 0.0125) < 1e-12  # population variance
    assert st["p50"] <= st["p95"] <= st["p99"] <= st["max"]


def test_store_snapshot_and_dynamic_names():
    s = MetricsStore()
    with s.measure("searches"):
        pass
    with s.measure("doc_searches"):  # created on first use
        pass
    snap = s.snapshot()
    assert snap["searches"]["count"] == 1
    assert snap["completions"]["count"] == 0
    assert snap["doc_searches"]["count"] == 1


def test_thread_safety_exact_counts():
    m = Metric()

    def work():
        for _ in range(1000):
            m.inc()
            m.add(0.001)

    ts = [threading.Thread(target=work) for _ in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    st = m.stats()
    assert st["count"] == 8000
    assert abs(st["sum"] - 8.0) < 1e-9
