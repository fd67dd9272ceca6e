"""S1 fetch seam: per-host partitioned fetch plumbing with a
deterministic fake transport; default transport raises."""

import pytest


def test_fetch_pages_with_fake_transport(spark):
    from hayoo_spark.sources import fetch

    def _fake(url: str):  # defined in-function: pickled by value
        if url.endswith("missing"):
            return 404, b""
        return 200, f"<html><body>page {url}</body></html>".encode()

    urls = [(f"https://h{i % 3}.org/p{i}",) for i in range(20)]
    urls.append(("https://h0.org/missing",))
    df = spark.createDataFrame(urls, "url string")
    got = {r["url"]: r for r in
           fetch.fetch_pages(df, fetcher=_fake, partitions=4).collect()}
    assert len(got) == 21
    assert got["https://h0.org/missing"]["status"] == 404
    ok = got["https://h1.org/p1"]
    assert ok["status"] == 200
    assert bytes(ok["html"]) == b"<html><body>page https://h1.org/p1</body></html>"


def test_fetch_feeds_the_builder(spark, tmp_path):
    """S1 -> A4 -> Q2: fetched pages build a searchable index."""
    from hayoo_spark.sources import fetch
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    df = spark.createDataFrame(
        [("https://a.org/walrus",), ("https://a.org/otter",)],
        "url string")
    pages = fetch.fetch_pages(df, fetcher=lambda u: (
        200, f"<html><body>animal {u.rsplit('/', 1)[1]}</body></html>"
        .encode()))
    src = str(tmp_path / "pages.parquet")
    pages.filter("status = 200").select("url", "html").write.parquet(src)
    ix = str(tmp_path / "ix")
    build_index(spark, src, ix, n_segments=2)
    eng = SearchEngine(spark, ix)
    assert [u for u, _ in eng.search("walrus", k=5)] == \
        ["https://a.org/walrus"]


def test_default_transport_raises(spark):
    from hayoo_spark.sources import fetch
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([("https://a.org/x",)], "url string")
    with pytest.raises(Exception) as e:
        fetch.fetch_pages(df).collect()
    assert "no HTTP transport" in str(e.value)