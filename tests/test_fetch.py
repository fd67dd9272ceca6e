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


def test_fetch_retries_transient_statuses(spark):
    """429/5xx and transport OSErrors retry up to max_retries with the
    backoff seam; a dead url degrades to a status-0 row instead of
    failing the partition."""
    from hayoo_spark.sources import fetch

    def _flaky(url: str):
        if url.endswith("slow"):
            return 503, b""          # always transient -> exhausted
        if url.endswith("boom"):
            raise ConnectionResetError("nope")  # OSError family
        return 200, b"<html><body>ok</body></html>"

    df = spark.createDataFrame(
        [("https://h.org/fine",), ("https://h.org/slow",),
         ("https://h.org/boom",)], "url string")
    got = {r["url"]: r for r in fetch.fetch_pages(
        df, fetcher=_flaky, partitions=1, max_retries=2).collect()}
    assert got["https://h.org/fine"]["status"] == 200
    assert got["https://h.org/fine"]["attempts"] == 1
    assert got["https://h.org/slow"]["status"] == 503
    assert got["https://h.org/slow"]["attempts"] == 3
    assert got["https://h.org/boom"]["status"] == 0
    assert got["https://h.org/boom"]["attempts"] == 3


def test_robots_matcher_rfc9309():
    from hayoo_spark.sources.robots import is_allowed, parse_robots

    txt = (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok*\n"
        "Disallow: /*.json$\n"
        "\n"
        "User-agent: hayoo\n"
        "Disallow: /hayoo-only/\n")
    # star group
    assert is_allowed(txt, "/public/page")
    assert not is_allowed(txt, "/private/x")
    assert is_allowed(txt, "/private/ok/deep")   # longest match: Allow
    assert not is_allowed(txt, "/api/data.json")  # wildcard + $ anchor
    assert is_allowed(txt, "/api/data.jsonl")     # $ anchor respected
    # specific agent group REPLACES the star group
    assert not is_allowed(txt, "/hayoo-only/x", agent="hayoo")
    assert is_allowed(txt, "/private/x", agent="hayoo")
    # empty Disallow allows everything
    assert parse_robots("User-agent: *\nDisallow:\n") == [(False, "")]
    assert is_allowed("User-agent: *\nDisallow:\n", "/anything")


def test_robots_filter_frontier(spark):
    from hayoo_spark.sources.robots import robots_filter

    frontier = spark.createDataFrame(
        [("https://a.org/ok",), ("https://a.org/private/x",),
         ("https://b.org/anything",), ("https://norobots.org/x",)],
        "url string")
    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /private/\n"),
         ("b.org", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string")
    got = sorted(r["url"] for r in
                 robots_filter(frontier, robots).collect())
    # a.org/private blocked, b.org fully blocked, missing robots -> allowed
    assert got == ["https://a.org/ok", "https://norobots.org/x"]


def test_default_transport_raises(spark):
    from hayoo_spark.sources import fetch
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([("https://a.org/x",)], "url string")
    with pytest.raises(Exception) as e:
        fetch.fetch_pages(df).collect()
    assert "no HTTP transport" in str(e.value)