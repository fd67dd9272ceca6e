#!/usr/bin/env python3
"""Distributed-mode serving latency at sf1 (300k docs) under the
serving posture — VERDICT r4 next-round item 2.

`BENCH/sf1.json`'s spark-mode p50 (1,146.5 ms) predates the serving
posture (`engine.warm(distributed=True)`: AQE off, 8 shuffle
partitions, postings relation persisted + materialized in executor
memory); the posture was only evidenced at sf0.1 (319.6 ms).  The
grouped-map path is the one that fans out on a real cluster, so its
10x number is the one that matters.  This script measures it: build
the 300k index, apply the posture, record spark-mode warm p50/p99
(plus the local serving tier for reference), and decompose the floor
(scheduling cost of an empty-result query).

Writes BENCH/sf1_serving.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import ENGINE_QUERIES, SHM_ROOT, _materialize_corpus  # noqa: E402

DOCS = int(os.environ.get("SF1_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SF1_REPS", "3"))


def pctl(xs, p):
    xs = sorted(xs)
    return round(1000 * xs[min(len(xs) - 1, int(p * len(xs)))], 1)


def measure(eng, mode: str, reps: int) -> list[float]:
    lat = []
    for q in ENGINE_QUERIES:
        eng.search(q, k=20, mode=mode)  # warm this query
        samples = []
        for _ in range(reps):
            t0 = time.monotonic()
            eng.search(q, k=20, mode=mode)
            samples.append(time.monotonic() - t0)
        lat.append(sorted(samples)[reps // 2])
    return lat


def main() -> None:
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.session import get_spark

    pages = _materialize_corpus(DOCS, shm=True)
    spark = get_spark(app_name="sf1-serving", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if SHM_ROOT:
        os.makedirs(SHM_ROOT, exist_ok=True)
    with tempfile.TemporaryDirectory(dir=SHM_ROOT) as tmp:
        ix = os.path.join(tmp, "ix")
        t0 = time.monotonic()
        build_index(spark, pages, ix, n_segments=32,
                    salt_df_threshold=4096, n_salts=8)
        build_sec = round(time.monotonic() - t0, 1)
        eng = SearchEngine(spark, ix)

        # pre-posture spark mode (what BENCH/sf1.json measured)
        pre = measure(eng, "spark", REPS)
        # serving posture: persisted postings relation + AQE off +
        # 8 shuffle partitions
        t0 = time.monotonic()
        eng.warm(distributed=True)
        warm_sec = round(time.monotonic() - t0, 1)
        post = measure(eng, "spark", REPS)
        local = measure(eng, "local", REPS)

        # floor decomposition: a zero-hit term pays pure scheduling +
        # grouped-map fan-out with no evaluation work
        floor = []
        for _ in range(7):
            t0 = time.monotonic()
            eng.search("zzznosuchterm", k=20, mode="spark")
            floor.append(time.monotonic() - t0)

    blob = {
        "docs": DOCS, "cores": CPUS, "reps": REPS,
        "build_sec": build_sec, "warm_distributed_sec": warm_sec,
        "spark_pre_posture_p50_ms": pctl(pre, 0.5),
        "spark_pre_posture_p99_ms": pctl(pre, 0.99),
        "spark_posture_p50_ms": pctl(post, 0.5),
        "spark_posture_p99_ms": pctl(post, 0.99),
        "local_p50_ms": pctl(local, 0.5),
        "local_p99_ms": pctl(local, 0.99),
        "spark_zero_hit_floor_p50_ms": pctl(floor, 0.5),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "sf1_serving.json"), "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
