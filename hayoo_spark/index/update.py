"""Incremental index maintenance: delete-before-insert at segment
granularity, plus a Structured-Streaming ingest wrapper.

Reference semantics: the indexers emit ``delete-by-query (package ∈
pkgs)`` followed by fresh inserts per package batch
(newHayooIndexer/src/FctIndexerCore.hs:95-105, gen-1
hayooIndexer/src/Hayoo/Hunt/FctIndexerCore.hs:167-188), selecting
packages newer than an age cutoff (HayooIndexer.hs:206-222).  Here the
unit of replacement is the *document segment* (hash(url) partition):

1. select changed pages (``warc_ts > since_ts``, or an explicit url set);
2. affected segments = distinct hash(url) mod n_segments;
3. drop those segments' docs/postings files + manifest rows
   (the delete-by-query);
4. re-run the builder in resume mode — only the dropped segments are
   pending — against the *updated* pages table (the insert);
5. refresh global stats + term dictionary (finalize).

Correctness under drifted stats: rebuilt segments encode block bounds
under the NEW avgdl; untouched segments keep bounds under their OLD
avgdl (recorded per segment per field in the manifest as
``enc_avgdl_json``).  The query engine scales each field's bounds by
``max(1, avgdl_now[f] / min(enc_avgdl[f]))``, which keeps block-max
pruning admissible (see query/engine.py); exact scoring always uses
current stats, so results stay rank-identical to a full rebuild
(tested in tests/test_update.py).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .builder import build_index


def _infer_n_segments(index_dir: str) -> int:
    """Segment count of an existing index.  Prefer the value persisted
    in stats/ — a crash-and-retry of an update may find segment dirs
    already deleted, so a glob over docs/ would under-count; the glob
    remains as the fallback for pre-r6 indexes."""
    try:
        import pyarrow.parquet as pq
        t = pq.read_table(os.path.join(index_dir, "stats"),
                          columns=["n_segments"])
        n = int(t["n_segments"][0].as_py())
        if n > 0:
            return n
    except Exception:
        pass
    segs = glob.glob(os.path.join(index_dir, "docs", "segment=*"))
    return max(int(os.path.basename(s).split("=")[1]) for s in segs) + 1


def affected_segments(spark: SparkSession, changed_urls: DataFrame,
                      n_segments: int) -> list[int]:
    rows = (
        changed_urls
        .select(F.pmod(F.xxhash64("url"), F.lit(n_segments)).cast("int").alias("segment"))
        .distinct().collect()
    )
    return sorted(r["segment"] for r in rows)


def update_index(
    spark: SparkSession,
    pages_path: str,
    index_dir: str,
    since_ts: str | None = None,
    changed_urls: DataFrame | None = None,
    **build_kwargs,
) -> dict:
    """Apply an incremental update.  ``pages_path`` must point at the
    CURRENT full pages table (the updated source of truth); only the
    segments owning changed urls are rebuilt."""
    # segment count is a physical property of the existing index — an
    # explicit kwarg is ignored in favor of the inferred value
    build_kwargs.pop("n_segments", None)
    n_segments = _infer_n_segments(index_dir)
    pages = spark.read.parquet(pages_path)
    if changed_urls is None:
        if since_ts is None:
            raise ValueError("need since_ts or changed_urls")
        changed_urls = pages.filter(F.col("warc_ts") > F.lit(since_ts)).select("url")
    # the field schema / corpus options live in stats — capture them so
    # the rebuild keeps the original contexts unless overridden
    srows = sorted(
        spark.read.parquet(os.path.join(index_dir, "stats")).collect(),
        key=lambda r: r["fkey"])
    if "fields" not in build_kwargs:
        from .fields import FieldSpec
        build_kwargs["fields"] = tuple(
            FieldSpec(r["field"], r["weight"], r["is_default"], r["source"],
                      r.asDict().get("ftype", "text"),
                      r.asDict().get("token_mode", "tokens"))
            for r in srows)
    if "drop_empty" in srows[0].asDict():
        build_kwargs.setdefault("drop_empty", bool(srows[0]["drop_empty"]))
    if "split_sections" in srows[0].asDict():
        build_kwargs.setdefault(
            "split_sections", bool(srows[0]["split_sections"]))
    if "store_cols_json" in srows[0].asDict():
        # stored doc columns (re-export merge's alt_uris/alt_modules)
        # must survive the rebuild or rebuilt segments lose them and
        # the doc store ends up with mixed per-segment schemas
        import json as _json
        build_kwargs.setdefault(
            "store_cols", tuple(_json.loads(srows[0]["store_cols_json"])))
    fields = build_kwargs["fields"]
    split_sections = bool(build_kwargs.get("split_sections", False))

    docs_path = os.path.join(index_dir, "docs")
    if split_sections:
        # indexed docs are keyed url#anchor, not page url: hashing the
        # PAGE url would miss the segments owning a changed page's
        # virtual docs.  Affected = segments of the page's EXISTING
        # virtual docs (doc-store lookup by base url — covers anchors
        # the new content dropped) ∪ segments of the NEW split urls.
        from ..split import split_virtual_docs
        ch = changed_urls.select(F.col("url").alias("_ch_url")).distinct()
        old_u = (spark.read.parquet(docs_path).select("url")
                 .join(ch, F.substring_index(F.col("url"), "#", 1)
                       == F.col("_ch_url"), "left_semi"))
        new_u = split_virtual_docs(
            pages.join(ch, pages["url"] == ch["_ch_url"], "left_semi")) \
            .select("url")
        eff_urls = old_u.unionByName(new_u)
    else:
        eff_urls = changed_urls
    segs = affected_segments(spark, eff_urls, n_segments)
    # crash-retry self-healing: a previous attempt may have died after
    # deleting segment dirs (streaming foreachBatch replays the batch
    # at-least-once).  Any segment with no manifest row OR no docs dir
    # is half-deleted and MUST join the rebuild set regardless of what
    # the replayed change set hashes to — with split_sections the
    # changed page's virtual docs may live ONLY in such a segment (the
    # doc-store lookup above cannot see deleted rows), and without this
    # union the retry would rebuild that segment from zero rows and
    # silently drop every unrelated doc it held.
    man_path = os.path.join(index_dir, "manifest")
    done: set[int] = set()
    nonempty: set[int] = set()
    try:
        for r in (spark.read.parquet(man_path)
                  .select("partition_id", "docs").collect()):
            done.add(int(r["partition_id"]))
            if (r["docs"] or 0) > 0:
                nonempty.add(int(r["partition_id"]))
    except Exception:
        pass
    present = {int(os.path.basename(p).split("=")[1]) for p in
               glob.glob(os.path.join(docs_path, "segment=*"))}
    # a legitimately EMPTY segment has a manifest row (docs=0) and no
    # docs dir (Hive partition writes create no dir for zero rows) —
    # that is NOT half-deleted; flagging it would turn every no-op
    # update into a rebuild (and, with n_segments > n_docs, every
    # incremental update into a full cold rebuild).
    half_deleted = [s for s in range(n_segments)
                    if s not in done or (s in nonempty
                                         and s not in present)]
    segs = sorted(set(segs) | set(half_deleted))
    if not segs:
        return {"segments_rebuilt": 0}

    # churn touching EVERY segment gains nothing from segment-wise
    # replay — a random change set of n docs touches ~S·(1-(1-1/S)^n)
    # of S segments, so 0.1%+ random churn hits all of them (measured:
    # a 20-of-32-segment update cost 2.3x a full rebuild).  Rebuild
    # cold instead of paying delete + incremental bookkeeping on top.
    if len(segs) == n_segments:
        build_index(spark, pages_path, index_dir,
                    n_segments=n_segments, resume=False, **build_kwargs)
        return {"segments_rebuilt": n_segments, "full_rebuild": True}

    # --- incremental global-stats merge (IDEMPOTENT — ADVICE r5): new
    # totals are derived from SURVIVING state, never from old-stats
    # deltas.  new = (kept segments' dl sums from the doc store — a
    # pruned columnar read, no tokenize) + (re-prepared touched
    # segments' totals).  A crash-and-retry at any point (streaming
    # foreachBatch is at-least-once) re-derives the same numbers: the
    # kept filter excludes the touched segments whether or not they
    # were already deleted or partially rebuilt, and the added pass is
    # a pure function of the current pages table.
    from pyspark import StorageLevel
    from .builder import (_stats_aggs, _write_stats, manifest_schema,
                          prepare_docs, write_meta_parquet)
    text_fields = [f for f in fields if f.ftype != "date"]
    kept = (spark.read.parquet(docs_path)
            .filter(~F.col("segment").isin(segs))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 *[F.sum(f"dl_{f.name}").alias(f"tot_{f.name}")
                   for f in text_fields])
            .collect()[0])
    src = pages
    if split_sections:
        src = split_virtual_docs(src)
    src = src.filter(
        F.pmod(F.xxhash64("url"), F.lit(n_segments)).cast("int")
        .isin(segs))
    # prepared ONCE and handed to build_index below — the touched
    # fraction pays extraction/tokenize a single time (ADVICE r5: the
    # old code re-derived it in build_index's partial-resume path)
    prepared = prepare_docs(
        src, n_segments, fields=fields,
        drop_empty=bool(build_kwargs.get("drop_empty", False)),
        store_cols=tuple(build_kwargs.get("store_cols", ()))) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    added = prepared.agg(*_stats_aggs(fields)).collect()[0]
    a = {"n_docs": int(kept["n_docs"] or 0) + int(added["n_docs"] or 0)}
    for f in text_fields:
        tot = int(kept[f"tot_{f.name}"] or 0) \
            + int(added[f"tot_{f.name}"] or 0)
        a[f"tot_{f.name}"] = tot
        a[f"avg_{f.name}"] = (tot / a["n_docs"]) if a["n_docs"] else 1.0
    _write_stats(a, fields, bool(build_kwargs.get("drop_empty", False)),
                 split_sections, os.path.join(index_dir, "stats"),
                 tuple(build_kwargs.get("store_cols", ())), n_segments)

    # delete-by-segment: drop data files + manifest rows
    for s in segs:
        for sub in ("docs", "postings"):
            shutil.rmtree(os.path.join(index_dir, sub, f"segment={s}"),
                          ignore_errors=True)
    man = spark.read.parquet(man_path).filter(~F.col("partition_id").isin(segs))
    kept = man.toPandas()
    shutil.rmtree(man_path, ignore_errors=True)
    if len(kept):
        import json
        if "enc_avgdl_json" not in kept.columns:  # pre-r3 manifest layout
            kept["enc_avgdl_json"] = kept["enc_avgdl"].map(
                lambda v: json.dumps({"text": float(v)}))
        write_meta_parquet(man_path, kept, manifest_schema())
    else:
        os.makedirs(man_path, exist_ok=True)

    # stats are frozen (merged above); the prepared relation covers
    # exactly the pending segments, so build_index skips its own
    # prepare pass entirely
    build_index(spark, pages_path, index_dir, n_segments=n_segments,
                resume=True, prepared_docs=prepared, **build_kwargs)
    return {"segments_rebuilt": len(segs)}


def delete_docs(
    spark: SparkSession,
    pages_path: str,
    index_dir: str,
    urls: DataFrame,
    **build_kwargs,
) -> dict:
    """Explicit document deletion (the reference's delete-before-insert
    command stream also carries bare deletes — hunt's Delete command).

    ``pages_path`` must already reflect the removal (it is the source
    of truth); the owning segments are rebuilt without the victims via
    the same delete-by-segment path as updates, so deletion cost is
    O(affected segments), not O(corpus).  Stats (N, avgdl) refresh to
    the post-delete corpus and the term dictionary re-finalizes."""
    return update_index(spark, pages_path, index_dir,
                        changed_urls=urls.select("url"), **build_kwargs)


def streaming_ingest(
    spark: SparkSession,
    stream_dir: str,
    pages_path: str,
    index_dir: str,
    checkpoint_dir: str,
    **build_kwargs,
):
    """Structured-Streaming wrapper: watch a directory of page-batch
    parquet drops; each micro-batch appends to the pages table and
    applies update_index for the batch's urls.

    The reference has no true streaming (SURVEY.md §2.7) — its
    incremental mode is batch micro-update; this maps that behavior to
    ``readStream -> foreachBatch`` with availableNow semantics so tests
    can drain deterministically."""
    schema = spark.read.parquet(pages_path).schema

    def handle(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        # upsert the pages table: delete-then-insert per url — a blind
        # append would lose to the builder's first-wins dedup (an
        # Iceberg MERGE INTO at scale; dir swap on plain parquet here)
        cur = spark.read.parquet(pages_path)
        upd = cur.join(batch_df.select("url"), "url", "left_anti") \
            .unionByName(batch_df)
        tmp = pages_path.rstrip("/") + ".tmp"
        upd.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(pages_path):
            shutil.rmtree(pages_path)
        else:
            os.remove(pages_path)
        os.rename(tmp, pages_path)
        update_index(spark, pages_path, index_dir,
                     changed_urls=batch_df.select("url"), **build_kwargs)

    return (
        spark.readStream.schema(schema).parquet(stream_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
