#!/usr/bin/env python3
"""Drill-down latency at 300k — VERDICT r4 next-round item 1 evidence.

Round 5 extended block-max pruning to field-scoped terms, filter-
combined ANDs and phrases under booleans (query/wand.py `_flat_terms`).
This script measures the delta ON THE 300k INDEX for exactly those
shapes (the reference's Q14 drill-down family — ``package:base AND
type:module`` — re-expressed over the bench corpus's title/tag/lang
contexts), by running each query through

- the NEW pruned planner (production routing), and
- the OLD exhaustive path (``_flat_with_not`` forced to None — what
  every one of these shapes did before round 5),

warm, median of N reps, same engine instance (shared caches, so the
comparison isolates evaluation strategy, not I/O).

Writes one JSON blob to BENCH/drilldown_300k.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import SHM_ROOT, _materialize_corpus  # noqa: E402

DOCS = int(os.environ.get("DD_DOCS", "300000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("DD_REPS", "5"))
N_SEGMENTS = int(os.environ.get("DD_SEGMENTS", "32"))
# BENCH/drilldown_<label>.json; 3M runs pass DD_LABEL=3m (VERDICT r5
# item 3: the A/B at the scale where the bound loop is the production
# route — per-segment lists exceed the EXHAUSTIVE_POSTINGS floor)
LABEL = os.environ.get("DD_LABEL", "300k")


def queries() -> list[tuple[str, str]]:
    from hayoo_spark import fixtures

    vocab = fixtures.make_vocab()
    heavy, nxt, mid, tail = vocab[0], vocab[1], vocab[100], vocab[4000]
    return [
        # (kind, query) — every kind that round 5 moved off the
        # exhaustive path, plus two already-pruned controls
        ("filter_and_heavy", f"cat:en AND {heavy}"),
        ("filter_and_mid", f"cat:de AND {mid}"),
        ("scoped_term", f"title:{heavy}"),
        ("scoped_and_filter", f"title:{heavy} AND cat:en"),
        ("lang_and_heavy", f"lang:de AND {heavy}"),
        ("range_and_heavy",
         f"warc_ts:[2024-01-01 TO 2024-06-01] AND {heavy}"),
        ("phrase_under_and", f'"{heavy} {nxt}" AND {mid}'),
        ("or_group_and", f"({heavy} OR {mid}) AND cat:en"),
        ("control_andnot", f"{heavy} AND NOT {mid}"),
        ("control_and", f"{heavy} AND {mid}"),
        ("control_term", heavy),
        ("control_tail", tail),
    ]


def time_both(eng, E, qs, reps: int):
    """Per query: warm once, then interleave pruned/exhaustive reps so
    neither path systematically benefits from running second (JIT,
    allocator, cache warmth).  Returns medians in ms per path."""
    pruned: dict[str, float] = {}
    exhaustive: dict[str, float] = {}
    orig = E._flat_with_not
    off = lambda ast, weights: (None, None)  # noqa: E731
    for kind, q in qs:
        eng.search(q, k=20)  # warm caches (postings decode, dict)
        E._flat_with_not = off
        try:
            eng.search(q, k=20)
        finally:
            E._flat_with_not = orig
        ps, es = [], []
        for _ in range(reps):
            t0 = time.monotonic()
            eng.search(q, k=20)
            ps.append(time.monotonic() - t0)
            E._flat_with_not = off
            try:
                t0 = time.monotonic()
                eng.search(q, k=20)
                es.append(time.monotonic() - t0)
            finally:
                E._flat_with_not = orig
        pruned[kind] = round(1000 * sorted(ps)[reps // 2], 2)
        exhaustive[kind] = round(1000 * sorted(es)[reps // 2], 2)
    return pruned, exhaustive


def main() -> None:
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.fields import FieldSpec
    from hayoo_spark.query import engine as E
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.session import get_spark

    fields = (
        FieldSpec("title", weight=2.5, default=True, source="title"),
        FieldSpec("text", weight=1.0, default=True, source="body"),
        # weight-0 drill-down context (the reference's `type`,
        # IndexSchema.hs:119) sourced from the corpus's lang column
        FieldSpec("cat", weight=0.0, default=False, source="lang"),
    )
    pages = _materialize_corpus(DOCS, shm=True)
    spark = get_spark(app_name="drilldown-bench", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    if SHM_ROOT:
        os.makedirs(SHM_ROOT, exist_ok=True)
    with tempfile.TemporaryDirectory(dir=SHM_ROOT) as tmp:
        ix = os.path.join(tmp, "ix")
        t0 = time.monotonic()
        build_index(spark, pages, ix, n_segments=N_SEGMENTS,
                    salt_df_threshold=4096, n_salts=8, fields=fields,
                    segments_per_batch=16 if DOCS >= 10**6 else None)
        build_sec = round(time.monotonic() - t0, 1)
        eng = SearchEngine(spark, ix)

        pruned, exhaustive = time_both(eng, E, qs, REPS)
        # sanity: both paths agree on results (rank identity)
        orig = E._flat_with_not
        for kind, q in qs:
            new = eng.search(q, k=20)
            E._flat_with_not = lambda ast, weights: (None, None)
            try:
                old = eng.search(q, k=20)
            finally:
                E._flat_with_not = orig
            # rank identity + score tolerance: the two paths multiply
            # (boost × idf × norm × doc_boost) in different association
            # orders, so scores can differ in the last ulp
            assert [u for u, _ in new] == [u for u, _ in old], \
                f"parity broke for {kind}: {q}"
            assert all(abs(a - b) <= 1e-9 * max(1.0, abs(b))
                       for (_, a), (_, b) in zip(new, old)), \
                f"score drift for {kind}: {q}"

    from hayoo_spark.query import wand as W
    blob = {
        "docs": DOCS,
        "cores": CPUS,
        "reps": REPS,
        "n_segments": N_SEGMENTS,
        "exhaustive_postings_floor": W.EXHAUSTIVE_POSTINGS,
        "build_sec": build_sec,
        "fields": "title(2.5,default) text(1.0,default) cat(0,filter)",
        "warm_ms_pruned": pruned,
        "warm_ms_exhaustive": exhaustive,
        "speedup": {k: round(exhaustive[k] / pruned[k], 2)
                    for k in pruned if pruned[k] > 0},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH",
                           f"drilldown_{LABEL}.json"), "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
