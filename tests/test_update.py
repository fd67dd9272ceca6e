"""Incremental update: delete-before-insert per segment must stay
rank-identical to a full rebuild (A9 analogue, SURVEY.md §2.7)."""

import shutil

import pandas as pd
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.index.builder import build_index
from hayoo_spark.index.update import streaming_ingest, update_index
from hayoo_spark.query.engine import SearchEngine

UPDATE_QUERIES = [
    "baba", "bibaba OR nibaba", "baba AND bibaba", "freshterm",
    "bib*", '"baba baba"', "lang:de AND baba",
]


def _updated_corpus(n=150):
    base = fixtures.make_pages(n)
    changed = base.iloc[5:10].copy()
    changed["text"] = "freshterm " + changed["text"]
    changed["html"] = [
        f"<html><head><title>t</title></head><body><p>{t}</p></body></html>".encode()
        for t in changed["text"]]
    changed["warc_ts"] = pd.Timestamp("2025-06-01").to_datetime64()
    new = base.iloc[:3].copy()
    new["url"] = [f"https://new.org/p/{i}" for i in range(3)]
    new["text"] = "freshterm brand new document " + new["text"]
    new["html"] = [
        f"<html><head><title>t</title></head><body><p>{t}</p></body></html>".encode()
        for t in new["text"]]
    new["warc_ts"] = pd.Timestamp("2025-06-02").to_datetime64()
    delta = pd.concat([changed, new]).reset_index(drop=True)
    delta["warc_ts"] = delta["warc_ts"].astype("datetime64[us]")
    full = pd.concat([base[~base["url"].isin(delta["url"])], delta]) \
        .reset_index(drop=True)
    return base, delta, full


def test_incremental_update_rank_identical(spark, tmp_path):
    base, delta, full = _updated_corpus()
    p0 = tmp_path / "pages_v0.parquet"
    p1 = tmp_path / "pages_v1.parquet"
    base.to_parquet(p0, index=False)
    full.to_parquet(p1, index=False)

    inc = str(tmp_path / "inc")
    build_index(spark, str(p0), inc, n_segments=4, salt_df_threshold=64)
    res = update_index(spark, str(p1), inc, since_ts="2025-01-01",
                       salt_df_threshold=64)
    assert 0 < res["segments_rebuilt"] <= 4

    ix = oracle.build_oracle_index(full, from_html=True)
    eng = SearchEngine(spark, inc)
    assert eng.n_docs == ix.n_docs
    for q in UPDATE_QUERIES:
        got = eng.search(q, k=20)
        want = oracle.search(ix, q, k=20)
        assert [u for u, _ in got] == [u for u, _ in want], q
        assert all(abs(g[1] - w[1]) < 1e-6 for g, w in zip(got, want)), q


def test_streaming_ingest(spark, tmp_path):
    base, delta, full = _updated_corpus()
    pages_dir = str(tmp_path / "pages")
    base_df = spark.createDataFrame(base)
    base_df.write.parquet(pages_dir)

    ixd = str(tmp_path / "ix")
    build_index(spark, pages_dir, ixd, n_segments=4, salt_df_threshold=64)

    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    delta.to_parquet(stream_dir / "batch0.parquet", index=False)

    q = streaming_ingest(spark, str(stream_dir), pages_dir, ixd,
                         str(tmp_path / "ckpt"), salt_df_threshold=64)
    q.awaitTermination(120)

    ix = oracle.build_oracle_index(full, from_html=True)
    eng = SearchEngine(spark, ixd)
    assert eng.n_docs == ix.n_docs
    got = eng.search("freshterm", k=20)
    want = oracle.search(ix, "freshterm", k=20)
    assert [u for u, _ in got] == [u for u, _ in want]
