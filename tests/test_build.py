"""Build-side invariants: resume ≡ cold build (bit-equal segments),
manifest lineage, salting neutrality (SURVEY.md §5.3, FIXTURES.md §4)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hayoo_spark import fixtures
from hayoo_spark.index import builder


def _snapshot(spark, ix):
    """Canonical content view of an index (order-insensitive)."""
    post = (
        spark.read.parquet(f"{ix}/postings")
        .select("segment", "term", "salt", "df", "cf",
                F.md5(F.hex("ids_vb")).alias("ids_h"),
                F.md5(F.hex("tfs_vb")).alias("tfs_h"),
                F.md5(F.hex("pos_vb")).alias("pos_h"),
                "block_last", "block_ub")
        .orderBy("segment", "term", "salt")
        .toPandas()
    )
    docs = (
        spark.read.parquet(f"{ix}/docs")
        .select("segment", "doc_id", "url", "dl_text")
        .orderBy("segment", "doc_id")
        .toPandas()
    )
    return post, docs


@pytest.fixture(scope="module")
def small_pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("bpages")
    out = d / "pages.parquet"
    fixtures.make_pages(150).to_parquet(out, index=False)
    return str(out)


def test_resume_equals_cold_build(spark, small_pages_path, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    cold = str(root / "cold")
    warm = str(root / "warm")
    builder.build_index(spark, small_pages_path, cold, n_segments=4,
                        salt_df_threshold=32, n_salts=4)

    # interrupted build: batch size 1, crash after 2 segments
    calls = {"n": 0}
    orig = builder._commit_manifest

    def crashing(spark_, ix, batch, elapsed, enc_avgdl, **kw):
        orig(spark_, ix, batch, elapsed, enc_avgdl, **kw)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")

    builder._commit_manifest = crashing
    try:
        with pytest.raises(RuntimeError):
            builder.build_index(spark, small_pages_path, warm, n_segments=4,
                                salt_df_threshold=32, n_salts=4,
                                segments_per_batch=1)
    finally:
        builder._commit_manifest = orig

    done = spark.read.parquet(f"{warm}/manifest")
    assert done.count() == 2  # checkpointed exactly the committed segments

    builder.build_index(spark, small_pages_path, warm, n_segments=4,
                        salt_df_threshold=32, n_salts=4,
                        segments_per_batch=1, resume=True)

    pc, dc = _snapshot(spark, cold)
    pw, dw = _snapshot(spark, warm)
    pd.testing.assert_frame_equal(pc, pw)
    pd.testing.assert_frame_equal(dc, dw)


def test_manifest_lineage(spark, index_dir):
    m = spark.read.parquet(f"{index_dir}/manifest").toPandas()
    assert set(m.columns) >= {
        "segment_id", "partition_id", "input_fingerprint", "docs",
        "postings", "docs_per_sec", "postings_per_sec", "skew_ratio",
        "commit_ts"}
    assert m["docs"].sum() > 0
    assert (m["skew_ratio"] >= 1.0).all()
    assert m["docs_per_sec"].gt(0).all()


def test_salting_splits_heavy_terms(spark, index_dir):
    post = spark.read.parquet(f"{index_dir}/postings")
    heavy = fixtures.make_vocab()[0]
    salts = post.filter(F.col("term") == heavy).select("salt").distinct().count()
    assert salts > 1, "heavy Zipf term should be salted into sub-lists"
    # salted sub-lists stay bounded
    mx = post.filter(F.col("term") == heavy).agg(F.max("df")).collect()[0][0]
    tot = post.filter(F.col("term") == heavy).agg(F.sum("df")).collect()[0][0]
    assert mx < tot


def test_unsalted_build_same_results(spark, small_pages_path, tmp_path_factory, oracle_ix):
    """Salting is a physical detail: salted and unsalted indexes must
    return identical search results."""
    from hayoo_spark.query.engine import SearchEngine

    root = tmp_path_factory.mktemp("nosalt")
    a = str(root / "salted")
    b = str(root / "plain")
    builder.build_index(spark, small_pages_path, a, n_segments=2,
                        salt_df_threshold=16, n_salts=4)
    builder.build_index(spark, small_pages_path, b, n_segments=2,
                        salt_df_threshold=10**9)
    ea, eb = SearchEngine(spark, a), SearchEngine(spark, b)
    for q in ["baba", "baba OR bibaba", "baba AND bibaba"]:
        assert ea.search(q, k=10) == eb.search(q, k=10)


def test_combine_is_batch_incremental(spark, tmp_path_factory):
    """_combine_occurrences must not materialize a whole partition: with
    a tiny Arrow batch size every doc (including the tf=10k heavy doc)
    straddles many batch boundaries, and the carry-over logic must not
    double-emit any (doc, term) group — the index must be bit-equal to
    one built with the default batch size."""
    root = tmp_path_factory.mktemp("combineinc")
    p = str(root / "pages.parquet")
    fixtures.make_pages(60).to_parquet(p, index=False)
    a, b = str(root / "a"), str(root / "b")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    builder.build_index(spark, p, a, n_segments=3, salt_df_threshold=32,
                        n_salts=4)
    try:
        spark.conf.set(key, "7")
        builder.build_index(spark, p, b, n_segments=3, salt_df_threshold=32,
                            n_salts=4)
    finally:
        spark.conf.set(key, old)
    pa_, da = _snapshot(spark, a)
    pb, db = _snapshot(spark, b)
    pd.testing.assert_frame_equal(pa_, pb)
    pd.testing.assert_frame_equal(da, db)


def test_all_empty_segment_visible_to_mixed_queries(spark, tmp_path_factory):
    """A segment whose every doc tokenizes to empty writes NO postings
    dir (drop_empty=False).  Its docs must still match the filter-only
    branch of a mixed query like ``term OR lang:de`` in both modes —
    the engine's segment universe comes from docs/, not postings/
    (ADVICE r2)."""
    import pandas as pd

    from hayoo_spark.query.engine import SearchEngine

    n_seg = 8
    # pick urls landing in three DISTINCT segments, the empty-text doc
    # alone in its own (segment = xxhash64(url) mod n_seg, JVM hash)
    cands = [f"https://seg.org/p/{i}" for i in range(64)]
    seg_of = {
        r["url"]: r["seg"]
        for r in spark.createDataFrame([(u,) for u in cands], "url string")
        .select("url", F.pmod(F.xxhash64("url"), F.lit(n_seg)).cast("int")
                .alias("seg")).collect()
    }
    by_seg: dict[int, list[str]] = {}
    for u, s in seg_of.items():
        by_seg.setdefault(s, []).append(u)
    segs = sorted(by_seg)[:3]
    u_text1, u_text2, u_empty = (by_seg[segs[0]][0], by_seg[segs[1]][0],
                                 by_seg[segs[2]][0])

    rows = [
        fixtures._row(u_text1, pd.Timestamp("2024-03-01").to_pydatetime(),
                      "alphaword betaword", "en"),
        fixtures._row(u_text2, pd.Timestamp("2024-03-02").to_pydatetime(),
                      "alphaword gammaword", "en"),
        # tokenizes to nothing (all tokens shorter than MIN_TOKEN_LEN)
        fixtures._row(u_empty, pd.Timestamp("2024-03-03").to_pydatetime(),
                      "a b 1", "de"),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                      "lang", "tag"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
    d = tmp_path_factory.mktemp("emptyseg")
    p = str(d / "pages.parquet")
    pdf.to_parquet(p, index=False)
    ix = str(d / "ix")
    builder.build_index(spark, p, ix, n_segments=n_seg)

    import glob as g
    import os as o
    post_segs = {int(o.path.basename(x).split("=")[1]) for x in
                 g.glob(f"{ix}/postings/segment=*")}
    assert segs[2] not in post_segs, "fixture must produce a docs-only segment"

    eng = SearchEngine(spark, ix)
    for mode in ("local", "spark"):
        got = {u for u, _ in eng.search("alphaword OR lang:de", k=10,
                                        mode=mode)}
        assert got == {u_text1, u_text2, u_empty}, mode


def test_drop_empty_boring_docs(spark, small_pages_path, tmp_path_factory):
    """A8 boring-doc filter (opt-in): docs with no default-field tokens
    are dropped at build time; scores stay rank-identical to an oracle
    built with the same rule (corpus stats shift because N changes)."""
    import pandas as pd

    from hayoo_spark import oracle
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("boring")
    ix = str(d / "ix")
    builder.build_index(spark, small_pages_path, ix, n_segments=4,
                        drop_empty=True)
    eng = SearchEngine(spark, ix)
    assert eng.search("url:https://edge.org/empty", k=5) == []
    pdf = pd.read_parquet(small_pages_path)
    oix = oracle.build_oracle_index(pdf, from_html=True, drop_empty=True)
    full = oracle.build_oracle_index(pdf, from_html=True)
    assert eng.n_docs == oix.n_docs < full.n_docs
    for q in ["baba", "baba OR bibaba", "lang:en OR lang:de"]:
        got = eng.search(q, k=10)
        want = oracle.search(oix, q, k=10)
        assert [u for u, _ in got] == [u for u, _ in want], q
