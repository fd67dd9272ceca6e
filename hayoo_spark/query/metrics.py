"""Serving metrics — the reference's EKG counter + latency-distribution
surface re-expressed in-process (hayoo-server/src/Hayoo/App/Metrics.hs:
43-78, App.hs:207-220; sampled by the ``/stats`` endpoint).

One :class:`Metric` = a monotonically increasing request counter plus a
running latency distribution, exactly the reference's
``Metric Counter Distribution`` pair.  Semantics preserved:

- the counter increments BEFORE the measured action runs, so errors
  still count ("it's intended to count regardless of errors",
  Metrics.hs:59);
- the distribution records wall seconds per completed call
  (``measureExecTime`` diffs UTCTime, i.e. wall clock);
- ``stats`` exposes EKG's Distribution.Stats fields (mean / variance /
  count / sum / min / max), plus p50/p95/p99 from a bounded sample ring
  — an honest extension the reference's ops story lacks but any serving
  deployment wants.

All operations are thread-safe (the engine serves concurrent searches
from a thread pool); the hot-path cost is one lock + O(1) updates —
variance via Welford, percentiles over a fixed 1024-slot ring sampled
at snapshot time.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

_RING = 1024


class Metric:
    """Counter + running latency distribution for one operation."""

    __slots__ = ("_lock", "count", "done", "sum", "min", "max",
                 "_mean", "_m2", "_ring", "_ring_n")

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.count = 0     # requests STARTED (reference counter)
        self.done = 0      # requests whose latency was recorded
        self.sum = 0.0
        self.min = float("inf")
        self.max = 0.0
        self._mean = 0.0
        self._m2 = 0.0
        self._ring: list[float] = [0.0] * _RING
        self._ring_n = 0

    def inc(self) -> None:
        with self._lock:
            self.count += 1

    def add(self, seconds: float) -> None:
        with self._lock:
            self.done += 1
            self.sum += seconds
            if seconds < self.min:
                self.min = seconds
            if seconds > self.max:
                self.max = seconds
            d = seconds - self._mean
            self._mean += d / self.done
            self._m2 += d * (seconds - self._mean)
            self._ring[self._ring_n % _RING] = seconds
            self._ring_n += 1

    @contextmanager
    def measure(self):
        """measureAndStore: count first, time the body, record on
        success (an exception propagates but the count stands)."""
        self.inc()
        t0 = time.monotonic()
        yield
        self.add(time.monotonic() - t0)

    def stats(self) -> dict:
        with self._lock:
            out = {
                "count": self.count,
                "mean": self._mean if self.done else 0.0,
                "variance": (self._m2 / self.done) if self.done else 0.0,
                "sum": self.sum,
                "min": self.min if self.done else 0.0,
                "max": self.max,
            }
            n = min(self._ring_n, _RING)
            sample = sorted(self._ring[:n])
        import math
        for q, lbl in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            # nearest-rank: ceil(q*n)-1 (p95 of 2 samples = the max)
            out[lbl] = (sample[max(0, math.ceil(q * len(sample)) - 1)]
                        if sample else 0.0)
        return out


class MetricsStore:
    """The engine's EKG-store analogue: named metrics, one JSON-able
    snapshot (``collectStats`` / the ``/stats`` sample).  The reference
    registers ``searches`` and ``completions`` (App.hs:207-211); extra
    names are created on first use."""

    def __init__(self, names: tuple[str, ...] = ("searches",
                                                 "completions")) -> None:
        self._lock = threading.Lock()
        self._metrics: dict[str, Metric] = {n: Metric() for n in names}

    def metric(self, name: str) -> Metric:
        with self._lock:
            m = self._metrics.get(name)
            if m is None:
                m = self._metrics[name] = Metric()
            return m

    def measure(self, name: str):
        return self.metric(name).measure()

    def snapshot(self) -> dict:
        with self._lock:
            items = list(self._metrics.items())
        return {n: m.stats() for n, m in items}
