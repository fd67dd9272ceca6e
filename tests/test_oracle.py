"""Oracle sanity + fixture determinism tests (no Spark)."""

import numpy as np
import pandas as pd

from hayoo_spark import fixtures, oracle
from hayoo_spark.analysis import extract_text_py, tokenize_py


def small_pages():
    return pd.DataFrame(
        {
            "url": ["u/a", "u/b", "u/c", "u/a"],
            "warc_ts": pd.to_datetime(
                ["2024-01-01", "2024-02-01", "2024-07-01", "2024-09-09"]),
            "html": [b"<p>apple banana apple</p>", b"<p>banana cherry</p>",
                     b"<p>apple cherry date banana</p>", b"<p>shadow</p>"],
            "text": ["apple banana apple", "banana cherry",
                     "apple cherry date banana", "shadow"],
            "lang": ["en", "de", "en", "en"],
        }
    )


def test_dedup_first_wins():
    ix = oracle.build_oracle_index(small_pages())
    assert ix.n_docs == 3
    assert "shadow" not in ix.postings


def test_extraction_matches_text_column():
    df = small_pages()
    for h, t in zip(df["html"], df["text"]):
        assert extract_text_py(h) == t


def test_bm25_ranking():
    ix = oracle.build_oracle_index(small_pages())
    res = oracle.search(ix, "apple", k=10)
    # u/a has tf=2 and shorter dl -> ranks first
    assert [u for u, _ in res] == ["u/a", "u/c"]
    assert res[0][1] > res[1][1] > 0


def test_and_or_not():
    ix = oracle.build_oracle_index(small_pages())
    assert [u for u, _ in oracle.search(ix, "apple AND cherry")] == ["u/c"]
    assert {u for u, _ in oracle.search(ix, "apple OR cherry")} == {"u/a", "u/b", "u/c"}
    assert [u for u, _ in oracle.search(ix, "banana AND NOT cherry")] == ["u/a"]


def test_phrase():
    ix = oracle.build_oracle_index(small_pages())
    assert [u for u, _ in oracle.search(ix, '"apple banana"')] == ["u/a"]
    # "apple banana apple" contains "banana apple" at positions 1-2
    assert [u for u, _ in oracle.search(ix, '"banana apple"')] == ["u/a"]
    assert [u for u, _ in oracle.search(ix, '"cherry apple"')] == []
    assert {u for u, _ in oracle.search(ix, '"cherry date banana"')} == {"u/c"}


def test_field_and_range():
    ix = oracle.build_oracle_index(small_pages())
    assert [u for u, _ in oracle.search(ix, "banana AND lang:de")] == ["u/b"]
    res = oracle.search(ix, "warc_ts:[2024-01-15 TO 2024-08-01] AND banana")
    assert {u for u, _ in res} == {"u/b", "u/c"}


def test_prefix_and_autocomplete():
    ix = oracle.build_oracle_index(small_pages())
    assert {u for u, _ in oracle.search(ix, "ch*")} == {"u/b", "u/c"}
    comp = oracle.autocomplete(ix, "ba")
    assert comp[0][0] == "banana" and comp[0][1] == 3


def test_boost_scales_scores():
    ix = oracle.build_oracle_index(small_pages())
    base = dict(oracle.search(ix, "apple"))
    boosted = dict(oracle.search(ix, "apple^2"))
    for u in base:
        assert np.isclose(boosted[u], 2 * base[u])


def test_fixture_determinism():
    a = fixtures.make_pages(200)
    b = fixtures.make_pages(200)
    pd.testing.assert_frame_equal(a, b)
    # text column byte-identical to extraction from html (input_hint invariant)
    for h, t in zip(a["html"], a["text"]):
        assert extract_text_py(h) == t


def test_fixture_edge_docs_present():
    df = fixtures.make_pages(100)
    urls = set(df["url"])
    for u in ["https://edge.org/empty", "https://edge.org/heavy",
              "https://edge.org/stoponly", "https://edge.org/unicode"]:
        assert u in u and u in urls
    assert (df["url"] == "https://example0.org/p/00000000").sum() == 2


def test_fixture_parts_union_shape():
    # parallel part generator (large-corpus path): union of parts has
    # the same global shape as the monolithic corpus — unique urls plus
    # the one duplicate-url edge doc, full host/tag spread, edge docs
    # only in the last part, and per-part determinism
    parts = [fixtures.make_pages_part(3000, p, 4) for p in range(4)]
    u = pd.concat(parts, ignore_index=True)
    mono = fixtures.make_pages(3000)
    assert len(u) == len(mono)
    assert list(u.columns) == list(mono.columns)
    assert (u.dtypes == mono.dtypes).all()
    assert set(u["url"]) == set(mono["url"])
    assert (u["url"] == "https://example0.org/p/00000000").sum() == 2
    assert not any(p["url"].str.startswith("https://edge.org/").any()
                   for p in parts[:-1])
    pd.testing.assert_frame_equal(parts[1],
                                  fixtures.make_pages_part(3000, 1, 4))
    # text column matches html extraction (input_hint invariant)
    for h, t in zip(parts[0]["html"].head(50), parts[0]["text"].head(50)):
        assert extract_text_py(h) == t


def test_fixture_parts_trailing_empty_parts_no_edge_dup():
    # ceil-division can make trailing parts empty (start >= n_total);
    # those parts share end == n_total with the last real slice and
    # must NOT also emit the edge docs (unique-url invariant)
    parts = [fixtures.make_pages_part(5, p, 4) for p in range(4)]
    assert len(parts[3]) == 0  # [5,5) empty slice
    u = pd.concat(parts, ignore_index=True)
    mono = fixtures.make_pages(5)
    assert len(u) == len(mono)
    assert sorted(u["url"]) == sorted(mono["url"])


def test_stoponly_doc_has_no_tokens():
    assert tokenize_py("a b c d e 1 2 3") == []


def test_queries_cover_kinds():
    qs = fixtures.make_queries()
    kinds = {q["kind"] for q in qs}
    assert {"term", "and", "or", "andnot", "prefix", "phrase",
            "field", "range", "boost", "paged", "fuzzy"} <= kinds
    assert len(qs) >= 55
