"""Per-section virtual-document splitting (T1 full): one page becomes
one doc per anchored heading, keyed url#anchor, matching the
reference's one-doc-per-declaration extraction
(hayooIndexer/src/Hayoo/Haddock.hs:113-454) generalized to webtext."""

import pandas as pd
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.analysis import extract_text_py
from hayoo_spark.split import split_pages_pdf

N_DOCS = 120


@pytest.fixture(scope="module")
def sect_pages():
    return fixtures.make_sectioned_pages(N_DOCS)


def test_split_pdf_semantics(sect_pages):
    out = split_pages_pdf(sect_pages)
    assert len(out) > len(sect_pages)
    # sectionless pages pass through byte-identical
    plain_urls = {u for u in sect_pages["url"] if int(u[-6:]) % 3 == 2}
    plain = out[out["url"].isin(plain_urls)]
    src = sect_pages[sect_pages["url"].isin(plain_urls)]
    assert plain["html"].tolist() == src["html"].tolist()
    # sectioned pages explode into url + url#anchor virtual docs
    assert (out["url"].str.contains("#sec")).any()
    # fan-out: every emitted row satisfies the extractor invariant
    for h, t in zip(out["html"], out["text"]):
        assert extract_text_py(h) == t
    # the preamble keeps the bare url; anchors follow the heading ids
    g = out[out["url"].str.startswith("https://sect.org/page/000000")]
    one = g[g["url"].str.split("#").str[0] == g["url"].iloc[0].split("#")[0]]
    assert one["url"].iloc[0].count("#") == 0


def test_split_marker_terms_isolated(sect_pages):
    """A section-unique marker term must appear in exactly ONE virtual
    doc — the splitter actually separates content."""
    out = split_pages_pdf(sect_pages)
    hits = out[out["text"].str.contains("only0x0", regex=False)]
    assert len(hits) == 1
    assert hits["url"].iloc[0].endswith("#sec0")


@pytest.fixture(scope="module")
def sect_oracle(sect_pages):
    return oracle.build_oracle_index(split_pages_pdf(sect_pages),
                                     from_html=True)


@pytest.fixture(scope="module")
def sect_engine(spark, sect_pages, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("splitix")
    p = str(d / "pages.parquet")
    sect_pages.to_parquet(p, index=False)
    ix = str(d / "ix")
    build_index(spark, p, ix, n_segments=4, split_sections=True)
    return SearchEngine(spark, ix)


QUERIES = ["baba", "baba AND bibaba", "bib*", "only0x0", "only3x1",
           '"baba baba"', "baba OR lang:de", "only6x0 OR only6x1"]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_split_rank_identity(sect_engine, sect_oracle, q, mode):
    got = sect_engine.search(q, k=20, mode=mode)
    want = oracle.search(sect_oracle, q, k=20)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


def test_split_returns_declaration_level_hits(sect_engine):
    """Searching a section marker returns THAT section's url#anchor —
    the reference's declaration-level result granularity."""
    got = sect_engine.search("only0x0", k=5)
    assert got and got[0][0] == "https://sect.org/page/000000#sec0"


HADDOCK_PAGE = (
    "<html><head><title>Acme.Data.List</title></head><body>"
    '<div id="module-header"><p class="caption">Acme.Data.List</p></div>'
    '<div id="description"><div class="doc">module docs baba</div></div>'
    '<div id="interface">'
    '<div class="top"><p class="src">'
    '<a name="v:mapx" class="def">mapx</a>'
    ' :: (a -&gt; b) -&gt; [a] -&gt; [b]</p>'
    '<div class="doc">apply a function walrus</div></div>'
    '<div class="top"><p class="src">'
    '<a name="t:Scenario" class="def">Scenario</a></p>'
    '<div class="doc">a data type otter</div></div>'
    "</div></body></html>"
)


def _haddock_pages():
    plain = ("<html><head><title>plain</title></head>"
             "<body>no decls badger here</body></html>")
    return pd.DataFrame({
        "url": ["https://hackage.test/docs/Acme-Data-List.html",
                "https://hackage.test/plain.html"],
        "html": [HADDOCK_PAGE.encode(), plain.encode()],
    })


def test_haddock_decl_split_semantics():
    """The declaration-item dialect (Haddock.hs:156-260): one virtual
    doc per <div class="top">, #anchor urls, def-name titles, rawsig
    signature column; decl-less pages pass through."""
    from hayoo_spark.split import split_decl_docs_pdf

    out = split_decl_docs_pdf(_haddock_pages())
    by_url = {r["url"]: r for _, r in out.iterrows()}
    assert set(by_url) == {
        "https://hackage.test/docs/Acme-Data-List.html",
        "https://hackage.test/docs/Acme-Data-List.html#v:mapx",
        "https://hackage.test/docs/Acme-Data-List.html#t:Scenario",
        "https://hackage.test/plain.html",
    }
    fn = by_url["https://hackage.test/docs/Acme-Data-List.html#v:mapx"]
    assert fn["signature"] == "(a -> b) -> [a] -> [b]"
    assert b"<title>mapx</title>" in fn["html"]
    assert b"walrus" in fn["html"] and b"otter" not in fn["html"]
    ty = by_url["https://hackage.test/docs/Acme-Data-List.html#t:Scenario"]
    assert ty["signature"] == ""  # no :: in a bare data decl
    # module section keeps the page url/title, empty signature
    mod = by_url["https://hackage.test/docs/Acme-Data-List.html"]
    assert mod["signature"] == "" and b"module docs" in mod["html"]
    assert by_url["https://hackage.test/plain.html"]["html"] == \
        _haddock_pages()["html"][1]


def test_haddock_decl_split_to_signature_search(spark, tmp_path):
    """Haddock page -> decl virtual docs -> SIGNATURE_FIELDS index ->
    a signature query finds the declaration (the reference's gen-1
    pipeline: Haddock.hs split feeding the rawsig context)."""
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.fields import SIGNATURE_FIELDS
    from hayoo_spark.query.engine import SearchEngine
    from hayoo_spark.split import split_decl_virtual_docs

    pages = spark.createDataFrame(_haddock_pages())
    out = split_decl_virtual_docs(pages)
    assert out.schema.fieldNames() == ["url", "html", "signature"]
    src = str(tmp_path / "pages.parquet")
    out.write.parquet(src)
    ix = str(tmp_path / "ix")
    build_index(spark, src, ix, n_segments=2, fields=SIGNATURE_FIELDS)
    eng = SearchEngine(spark, ix)
    hits = eng.search_frontend("(a -> b) -> [a] -> [b]", k=5)
    assert hits and hits[0][0].endswith("#v:mapx")


def test_split_persisted_for_resume(spark, sect_pages, tmp_path_factory):
    """split_sections is part of the frozen schema: a resumed build
    re-applies it without the caller restating the flag."""
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("splitresume")
    p = str(d / "pages.parquet")
    sect_pages.to_parquet(p, index=False)
    ix = str(d / "ix")
    build_index(spark, p, ix, n_segments=4, split_sections=True,
                segments_per_batch=2)
    stats = spark.read.parquet(f"{ix}/stats").collect()[0]
    assert bool(stats["split_sections"])
    eng = SearchEngine(spark, ix)
    assert eng.search("only0x0", k=2)[0][0].endswith("#sec0")


# Haddock 2.6 (table-layout) dialect — old-corpus pages
# (Haddock.hs:113-124 dispatch, :493-578 mkVirtualDoc26)
HADDOCK26_PAGE = (
    "<html><head><title>Acme.Old</title></head><body>"
    "<table><tr><td class=\"topbar\">Acme.Old</td></tr>"
    "<tr><td class=\"section1\">Synopsis ibex</td></tr>"
    "<tr class=\"decl\" id=\"mapy\"><td class=\"decl\">"
    "mapy :: (a -&gt; b) -&gt; [a] -&gt; [b]</td></tr>"
    "<tr class=\"doc\"><td>apply a function wombat</td></tr>"
    "<tr class=\"decl\" id=\"Thing\"><td class=\"decl\">"
    "data Thing a</td></tr>"
    "<tr class=\"doc\"><td>a data type quokka</td></tr>"
    "<tr class=\"decl\" id=\"%21%21\"><td class=\"decl\">"
    "(!!) :: [a] -&gt; Int -&gt; a</td></tr>"
    "<tr><td class=\"botbar\"><a href=\"h\">Haddock</a></td></tr>"
    "</table></body></html>"
)


def test_haddock26_decl_split_semantics():
    """2.6 pages split at <tr class="decl" id=...> rows: unescaped-id
    titles, #t:/#v: prefix from the declaration's first word, signature
    after '::' — and the dispatcher routes each page by its own shape
    (prepareHaddock's 2.8-orElse-2.6)."""
    from hayoo_spark.split import split_decl_docs_pdf

    pages = pd.DataFrame({
        "url": ["https://hackage.test/old/Acme-Old.html",
                "https://hackage.test/docs/Acme-Data-List.html"],
        "html": [HADDOCK26_PAGE.encode(), HADDOCK_PAGE.encode()],
    })
    out = split_decl_docs_pdf(pages)
    by_url = {r["url"]: r for _, r in out.iterrows()}
    # 2.6 page: function decl -> #v:, data decl -> #t:,
    # URI-escaped id (%21%21 = !!) unescaped in title and url
    fn = by_url["https://hackage.test/old/Acme-Old.html#v:mapy"]
    assert fn["signature"] == "(a -> b) -> [a] -> [b]"
    assert b"<title>mapy</title>" in fn["html"]
    assert b"wombat" in fn["html"] and b"quokka" not in fn["html"]
    ty = by_url["https://hackage.test/old/Acme-Old.html#t:Thing"]
    assert ty["signature"] == ""
    op = by_url["https://hackage.test/old/Acme-Old.html#v:!!"]
    assert op["signature"] == "[a] -> Int -> a"
    # section 0 keeps the page url with the synopsis prelude
    mod = by_url["https://hackage.test/old/Acme-Old.html"]
    assert mod["signature"] == "" and b"ibex" in mod["html"]
    # the 2.8 page in the SAME batch still splits the 2.8 way
    assert ("https://hackage.test/docs/Acme-Data-List.html#v:mapx"
            in by_url)
    # page order preserved: all 2.6 rows precede all 2.8 rows
    urls = list(out["url"])
    assert urls.index("https://hackage.test/old/Acme-Old.html#v:mapy") < \
        urls.index("https://hackage.test/docs/Acme-Data-List.html#v:mapx")


def test_haddock26_extract_text_invariant():
    """The per-row extract invariant holds for 2.6 virtual docs too:
    carrying a text column recomputes it from the rebuilt html."""
    from hayoo_spark.analysis import extract_text_series
    from hayoo_spark.split import split_decl_docs_pdf

    pages = pd.DataFrame({
        "url": ["https://hackage.test/old/Acme-Old.html"],
        "html": [HADDOCK26_PAGE.encode()],
    })
    pages["text"] = extract_text_series(
        pages["html"].map(lambda b: b.decode()))
    out = split_decl_docs_pdf(pages)
    got = extract_text_series(
        out["html"].map(lambda b: b.decode()))
    assert list(out["text"]) == list(got)
