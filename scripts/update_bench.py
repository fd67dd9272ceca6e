#!/usr/bin/env python3
"""Incremental-update bench — VERDICT r4 next-round item 5.

`index/update.py` is correctness-tested (update ≡ rebuild bit-equal)
but had no performance number.  This measures the reference's daily-
update path (delete-before-insert, HayooIndexer.hs:206-222) on the 300k
index: change N docs, rebuild only the segments owning them, and
compare against the full-rebuild wall time.

The honest scale story this records: segments are doc-hash partitioned,
so a RANDOM change set of n docs touches ~S·(1-(1-1/S)^n) of S segments
— a single-doc upsert touches 1 segment, but ≥0.1% random churn
touches all of them, and the savings collapse to the non-encode phases.
(The reference has the same physics: its daily update replays whole
packages into a single-node index; cost there scales with replayed doc
count instead.)

Writes BENCH/update_300k.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import SHM_ROOT, _materialize_corpus  # noqa: E402

DOCS = int(os.environ.get("UB_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: changed-doc counts: single upsert, 0.01%, 1%, 10%
CASES = (1, DOCS // 10000, DOCS // 100, DOCS // 10)


def main() -> None:
    from pyspark.sql import functions as F

    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.update import update_index
    from hayoo_spark.session import get_spark

    pages = _materialize_corpus(DOCS, shm=True)
    spark = get_spark(app_name="update-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if SHM_ROOT:
        os.makedirs(SHM_ROOT, exist_ok=True)
    results = []
    with tempfile.TemporaryDirectory(dir=SHM_ROOT) as tmp:
        ix = os.path.join(tmp, "ix")
        t0 = time.monotonic()
        build_index(spark, pages, ix, n_segments=32,
                    salt_df_threshold=4096, n_salts=8)
        full_sec = round(time.monotonic() - t0, 1)

        all_urls = (spark.read.parquet(pages)
                    .select("url").orderBy("url"))
        for n in CASES:
            # deterministic change set: first n urls of a shuffled-by-
            # hash order (spread like real churn, stable across runs)
            changed = (all_urls
                       .orderBy(F.xxhash64("url"))
                       .limit(n))
            work = os.path.join(tmp, f"upd_{n}")
            shutil.copytree(ix, work)
            t0 = time.monotonic()
            m = update_index(spark, pages, work, changed_urls=changed)
            upd_sec = round(time.monotonic() - t0, 1)
            results.append({
                "changed_docs": n,
                "update_sec": upd_sec,
                "segments_rebuilt": m.get("segments_rebuilt"),
                "vs_full_rebuild": round(upd_sec / full_sec, 2),
            })
            shutil.rmtree(work, ignore_errors=True)
            print(json.dumps(results[-1]), file=sys.stderr)

    blob = {"docs": DOCS, "cores": CPUS, "n_segments": 32,
            "full_build_sec": full_sec, "updates": results}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "update_300k.json"), "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
