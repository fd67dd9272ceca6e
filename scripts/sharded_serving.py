#!/usr/bin/env python3
"""Multi-process segment-sharded serving throughput — VERDICT r5
next-round item 4.

One serving process's evaluation throughput is GIL-bounded (measured
r5: a thread pool over segments is 3x slower; 8 free-running request
threads over one engine convoy to ~the serial rate, so bench.py's
8-thread qps ~74 at 30k docs).  The documented scale-out unit is the
segment-sharded serving PROCESS — the reference scales the same way by
running more Hunt servers (Makefile:32-34).  This script measures it:

- build the 300k index (32 segments) once;
- for N in {1, 2, 4}: spawn N shard processes, each opening the SAME
  index restricted to a disjoint segment slice
  (SearchEngine(segments=...)), warmed;
- 8 driver request threads replay the warm query mix; each request
  broadcasts to all N shards and merges the shard top-k lists by
  (-score, url) — exactly the unsharded ordering (shards score with
  GLOBAL df/avgdl);
- report merged-queries-per-second per N, plus scaling efficiency
  qps(N) / (N * qps(1)), and a rank-identity check of the merged
  results vs an unsharded engine.

Writes BENCH/sharded_serving.json and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import ENGINE_QUERIES, SHM_ROOT, _materialize_corpus  # noqa: E402

DOCS = int(os.environ.get("SHARD_DOCS", "300000"))
N_SEGMENTS = int(os.environ.get("SHARD_SEGMENTS", "32"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WINDOW_SEC = float(os.environ.get("SHARD_WINDOW_SEC", "15"))
REQ_THREADS = int(os.environ.get("SHARD_REQ_THREADS", "8"))
K = 20
# reuse a pre-built index (e.g. the persistent sf10 one) instead of
# building: SHARD_IX_DIR=/dev/shm/sf10_ix SHARD_LABEL=3m
IX_DIR = os.environ.get("SHARD_IX_DIR", "")
LABEL = os.environ.get("SHARD_LABEL", "")


def _shard_worker(ix: str, segs: list[int], inq: mp.Queue, outq: mp.Queue,
                  ready: mp.Queue) -> None:
    """One serving process: a sharded engine over `segs`, local mode.
    Protocol: inq items are (qid, query) -> outq (qid, [(url, score)]);
    a None item shuts the worker down."""
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.session import get_spark

    spark = get_spark(app_name=f"shard-{segs[0]}", cores=2,
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, ix, segments=tuple(segs))
    eng.warm(top_terms=256, positions_top=32)
    for q in ENGINE_QUERIES:  # steady-state: everything decoded
        eng.search(q, k=K)
    ready.put(os.getpid())
    while True:
        item = inq.get()
        if item is None:
            break
        qid, q = item
        outq.put((qid, eng.search(q, k=K)))


class ShardClient:
    """Broadcast/merge front over N shard processes."""

    def __init__(self, ix: str, n: int, n_segments: int):
        ctx = mp.get_context("spawn")
        self.n = n
        self.inqs = [ctx.Queue() for _ in range(n)]
        self.outq = ctx.Queue()
        ready = ctx.Queue()
        slices = [list(range(i, n_segments, n)) for i in range(n)]
        self.procs = [
            ctx.Process(target=_shard_worker, daemon=True,
                        args=(ix, slices[i], self.inqs[i], self.outq, ready))
            for i in range(n)]
        for p in self.procs:
            p.start()
        for _ in range(n):
            ready.get(timeout=600)
        self._lock = threading.Lock()
        self._pending: dict[int, list] = {}
        self._events: dict[int, threading.Event] = {}
        self._next_qid = 0
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._collector.start()

    def _collect(self):
        while True:
            got = self.outq.get()
            if got is None:
                return
            qid, res = got
            with self._lock:
                slot = self._pending.get(qid)
                if slot is None:
                    continue
                slot.append(res)
                if len(slot) == self.n:
                    self._events[qid].set()

    def search(self, q: str, k: int = K):
        with self._lock:
            qid = self._next_qid
            self._next_qid += 1
            self._pending[qid] = []
            ev = self._events[qid] = threading.Event()
        for inq in self.inqs:
            inq.put((qid, q))
        ok = ev.wait(120)
        with self._lock:
            parts = self._pending.pop(qid)
            self._events.pop(qid)
        if not ok or len(parts) != self.n:
            # a dead/stuck shard must fail the benchmark loudly — a
            # partial merge would report a bogus qps from wrong top-k
            raise RuntimeError(
                f"shard timeout: {len(parts)}/{self.n} responses for {q!r}")
        merged = [t for res in parts for t in res]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def close(self):
        for inq in self.inqs:
            inq.put(None)
        self.outq.put(None)
        for p in self.procs:
            p.join(30)
            if p.is_alive():
                p.terminate()


def measure_qps(client, window_sec: float, threads: int) -> float:
    stop = time.monotonic() + window_sec
    counts = [0] * threads

    def worker(i):
        j = i  # stagger the mix so threads don't lockstep one query
        while time.monotonic() < stop:
            client.search(ENGINE_QUERIES[j % len(ENGINE_QUERIES)], k=K)
            counts[i] += 1
            j += 1

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(threads)]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return sum(counts) / (time.monotonic() - t0)


def main() -> None:
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.session import get_spark

    report: dict = {"docs": DOCS, "n_segments": N_SEGMENTS,
                    "req_threads": REQ_THREADS,
                    "window_sec": WINDOW_SEC, "k": K}

    spark = get_spark(app_name="shard-build", cores=CPUS,
                      shuffle_partitions=3 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if SHM_ROOT:
        os.makedirs(SHM_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=SHM_ROOT)
    try:
        if IX_DIR:
            ix = IX_DIR
        else:
            pages = _materialize_corpus(DOCS, shm=True)
            ix = os.path.join(tmp, "ix")
            t0 = time.monotonic()
            build_index(spark, pages, ix, n_segments=N_SEGMENTS,
                        salt_df_threshold=4096, n_salts=8)
            report["build_sec"] = round(time.monotonic() - t0, 1)

        # reference results for the rank-identity check
        ref = SearchEngine(spark, ix)
        n_segments = len(ref._segments)
        report["docs"] = ref.n_docs
        report["n_segments"] = n_segments
        ref.warm(top_terms=256, positions_top=32)
        want = {q: ref.search(q, k=K) for q in ENGINE_QUERIES}
        spark.stop()  # the serving processes own the box from here

        results = {}
        for n in (1, 2, 4):
            client = ShardClient(ix, n, n_segments)
            try:
                for q in ENGINE_QUERIES:  # parity before timing
                    got = client.search(q, k=K)
                    assert got == want[q], (n, q, got[:3], want[q][:3])
                measure_qps(client, 3.0, REQ_THREADS)  # warm the window
                qps = measure_qps(client, WINDOW_SEC, REQ_THREADS)
                results[str(n)] = round(qps, 1)
            finally:
                client.close()
        report["qps_by_shards"] = results
        base = results["1"]
        report["scaling"] = {
            str(n): round(results[str(n)] / (n * base), 3)
            for n in (2, 4)}
        report["speedup"] = {
            str(n): round(results[str(n)] / base, 2) for n in (2, 4)}
    finally:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    name = f"sharded_serving_{LABEL}.json" if LABEL else "sharded_serving.json"
    with open(os.path.join(REPO, "BENCH", name), "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
