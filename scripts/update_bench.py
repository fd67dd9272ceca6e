#!/usr/bin/env python3
"""Incremental-update bench — VERDICT r4 next-round item 5.

`index/update.py` is correctness-tested (update ≡ rebuild bit-equal)
but had no performance number.  This measures the reference's daily-
update path (delete-before-insert, HayooIndexer.hs:206-222) on the 300k
index: change N docs, rebuild only the segments owning them, and
compare against the full-rebuild wall time.

The honest scale story this records: segments are doc-hash partitioned,
so a RANDOM change set of n docs touches ~S·(1-(1-1/S)^n) of S segments
— a single-doc upsert touches 1 segment, but ≥1% random churn touches
all of them, at which point update_index routes to a plain full rebuild
(measured: segment-wise replay of an all-segments change set cost 2.3x
a cold rebuild before that router existed).  The partial-resume fast
path prunes extraction/tokenization to the touched segments' pages, so
small updates scale with the touched fraction, not the corpus.

Protocol: every case runs in its own subprocess with a steady-state
warmup build first (bench.py's protocol — session aging across
repeated corpus passes inflated late cases ~6x in a shared session).

Writes BENCH/update_300k.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import SHM_ROOT, _materialize_corpus  # noqa: E402

DOCS = int(os.environ.get("UB_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: changed-doc counts: single upsert, 0.01%, 1%, 10%
CASES = (1, DOCS // 10000, DOCS // 100, DOCS // 10)

_PAYLOAD = r"""
import sys, json, time, tempfile, shutil, os
sys.path.insert(0, {repo!r})
from hayoo_spark.session import get_spark
from hayoo_spark.index.builder import build_index
from hayoo_spark.index.update import update_index
from pyspark.sql import functions as F

pages, n, cpus, shm = {pages!r}, {n}, {cpus}, {shm!r}
spark = get_spark(app_name=f"upd-bench-{{n}}", cores=cpus,
                  shuffle_partitions=3 * cpus)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(dir=shm)
try:
    # steady-state warmup: same pipeline over a tiny slice (JIT, python
    # workers), exactly bench.build_once's protocol
    warm_pages = os.path.join(tmp, "warm-pages")
    spark.read.parquet(pages).limit(500).write.mode("overwrite") \
        .parquet(warm_pages)
    build_index(spark, warm_pages, os.path.join(tmp, "warm-ix"),
                n_segments=4, salt_df_threshold=4096, n_salts=8)
    t0 = time.monotonic()
    ix = os.path.join(tmp, "ix")
    build_index(spark, pages, ix, n_segments=32,
                salt_df_threshold=4096, n_salts=8)
    full_sec = time.monotonic() - t0
    changed = (spark.read.parquet(pages).select("url")
               .orderBy(F.xxhash64("url")).limit(n))
    t0 = time.monotonic()
    m = update_index(spark, pages, ix, changed_urls=changed)
    upd_sec = time.monotonic() - t0
    print("CASEJSON " + json.dumps({{
        "changed_docs": n, "full_build_sec": round(full_sec, 1),
        "update_sec": round(upd_sec, 1),
        "segments_rebuilt": m.get("segments_rebuilt"),
        "full_rebuild_routed": bool(m.get("full_rebuild")),
        "vs_full_rebuild": round(upd_sec / full_sec, 2)}}))
finally:
    shutil.rmtree(tmp, ignore_errors=True)
"""


def main() -> None:
    pages = _materialize_corpus(DOCS, shm=True)
    if SHM_ROOT:
        os.makedirs(SHM_ROOT, exist_ok=True)
    results = []
    for n in CASES:
        code = _PAYLOAD.format(repo=REPO, pages=pages, n=n, cpus=CPUS,
                               shm=SHM_ROOT or "/tmp")
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=1200)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("CASEJSON ")]
        if not line:
            raise RuntimeError(
                f"case {n} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
        results.append(json.loads(line[0][len("CASEJSON "):]))
        print(json.dumps(results[-1]), file=sys.stderr)

    fulls = [r["full_build_sec"] for r in results]
    blob = {"docs": DOCS, "cores": CPUS, "n_segments": 32,
            "full_build_sec_median": sorted(fulls)[len(fulls) // 2],
            "updates": results}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "update_300k.json"), "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
