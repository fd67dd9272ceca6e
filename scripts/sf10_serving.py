#!/usr/bin/env python3
"""Distributed-mode serving latency at sf10 (3M docs, 64 segments)
under the serving posture — VERDICT r5 next-round item 2.

`BENCH/sf10.json`'s spark_mem numbers (p50 1.5 s / p99 11.3 s) were
measured WITHOUT the posture, in the same process right after the
523 s build; `sf1_serving.json` proved the posture at 300k only.  The
grouped-map path is the one that fans out on a real cluster, so its
3M-under-posture number is the one that matters.  Protocol is
scripts/sf1_serving.py's, against the persistent sf10 index
(SF10_IX_DIR, built by sf10_proof.py) in a FRESH process:

- pre-posture spark mode;
- posture with the legacy 8 shuffle partitions;
- posture with partitions sized to the 64-segment layout (the engine's
  new >=1M-docs auto rule) — reported separately so the sizing rule is
  evidenced, not asserted;
- local serving tier + the zero-hit scheduling floor decomposition.

Writes BENCH/sf10_serving.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import ENGINE_QUERIES  # noqa: E402

IX = os.environ.get("SF10_IX_DIR", "/dev/shm/sf10_ix")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SF10_REPS", "3"))
# same protocol serves any scale point: point SF10_IX_DIR at the index
# and SERVING_OUT at the result file (e.g. sf33_serving.json for 10M)
OUT = os.environ.get("SERVING_OUT", "sf10_serving.json")


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
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.session import get_spark

    spark = get_spark(app_name="sf10-serving", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    eng = SearchEngine(spark, IX)

    # pre-posture spark mode (what sf10.json's spark_mem measured,
    # minus the post-build memory-pressure context)
    pre = measure(eng, "spark", REPS)

    # posture, legacy 8 partitions
    t0 = time.monotonic()
    eng.warm(distributed=True, shuffle_partitions=8)
    warm_sec = round(time.monotonic() - t0, 1)
    post8 = measure(eng, "spark", REPS)

    # posture, partitions sized to the segment layout (auto rule)
    eng.warm(top_terms=0, positions_top=0, distributed=True)
    n_auto = int(spark.conf.get("spark.sql.shuffle.partitions"))
    post_auto = measure(eng, "spark", REPS)

    local = measure(eng, "local", REPS)

    floor = []
    for _ in range(7):
        t0 = time.monotonic()
        eng.search("zzznosuchterm", k=20, mode="spark")
        floor.append(time.monotonic() - t0)

    blob = {
        "docs": eng.n_docs, "segments": len(eng._segments),
        "cores": CPUS, "reps": REPS,
        "warm_distributed_sec": warm_sec,
        "spark_pre_posture_p50_ms": pctl(pre, 0.5),
        "spark_pre_posture_p99_ms": pctl(pre, 0.99),
        "spark_posture8_p50_ms": pctl(post8, 0.5),
        "spark_posture8_p99_ms": pctl(post8, 0.99),
        "posture_auto_partitions": n_auto,
        "spark_posture_auto_p50_ms": pctl(post_auto, 0.5),
        "spark_posture_auto_p99_ms": pctl(post_auto, 0.99),
        "local_p50_ms": pctl(local, 0.5),
        "local_p99_ms": pctl(local, 0.99),
        "spark_zero_hit_floor_p50_ms": pctl(floor, 0.5),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", OUT), "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
