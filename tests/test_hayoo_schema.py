"""The packaged 18-context Hayoo schema preset (HAYOO_FIELDS): DDL
byte-parity with the reference's shipped 00-schema.js, and an e2e build
over a declaration corpus with rank-identity vs the oracle."""

import json
import os

import pandas as pd
import pytest

from hayoo_spark import oracle
from hayoo_spark.index.fields import HAYOO_FIELDS
from hayoo_spark.sinks.commands import HAYOO_REGEXPS, schema_commands

REF_SCHEMA = "/root/reference/newHayooIndexer/00-schema.js"


@pytest.mark.skipif(not os.path.exists(REF_SCHEMA),
                    reason="reference schema file not present")
def test_schema_ddl_matches_reference_00_schema_js():
    """schema_commands(HAYOO_FIELDS) must reproduce the reference's
    shipped DDL file EXACTLY — context order, regexps, weights,
    default flags, date types (00-schema.js:1-165)."""
    with open(REF_SCHEMA) as fh:
        want = json.load(fh)
    got = schema_commands(HAYOO_FIELDS, HAYOO_REGEXPS)
    assert got == want


def _decl_corpus(n=40):
    rows = []
    for i in range(n):
        pkg = f"pkg{i % 5}"
        mod = f"Acme.Mod{i % 3}.Sub{i % 2}"
        rows.append({
            "url": f"https://hackage.test/{pkg}/docs#v:fn{i}",
            "text": f"does thing number {i} walrus" + (" otter" if i % 4 == 0 else ""),
            "author": f"author{i % 3}",
            "category": "data" if i % 2 else "web",
            "dependencies": f"base pkg{(i + 1) % 5}",
            "module": mod,
            "name": f"fooBar{i}",
            "package": pkg,
            "source": f"src-{i}",
            "synopsis": f"synopsis words {i % 7}",
            "fct_type": "function" if i % 3 else "data",
            "version": f"1.{i % 4}",
            "maintainer": f"m{i % 2}",
            "signature": "(a -> b) -> [a] -> [b]" if i % 5 == 0 else f"Int -> T{i % 3}",
            "upload_ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=i),
            "indexed_ts": pd.Timestamp("2024-06-01") + pd.Timedelta(days=i),
        })
    pdf = pd.DataFrame(rows)
    pdf["lang"] = ["en" if i % 2 else "de" for i in range(len(pdf))]
    pdf["warc_ts"] = pd.Timestamp("2024-03-01")
    for c in ("upload_ts", "indexed_ts", "warc_ts"):
        pdf[c] = pdf[c].astype("datetime64[us]")  # Spark rejects NANOS
    return pdf


HAYOO_QUERIES = [
    "fooBar7",                     # name context dominates (weight 3)
    "walrus",                      # description (body) context
    "package:pkg2",
    "module:Acme.Mod1.Sub1",       # whole dotted path (`.*` context)
    "acme",                        # hierarchy tokenizes the parts
    "type:function AND walrus",    # weight-0 filter context
    "dependencies:base",
    "upload:[2024-01 TO 2024-01] AND walrus",
    "synopsis AND author:author1",
]


@pytest.fixture(scope="module")
def hayoo_setup(spark, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    pdf = _decl_corpus()
    d = tmp_path_factory.mktemp("hayooix")
    src = str(d / "pages.parquet")
    pdf.to_parquet(src, index=False)
    ix = str(d / "ix")
    build_index(spark, src, ix, n_segments=4, salt_df_threshold=64,
                fields=HAYOO_FIELDS)
    eng = SearchEngine(spark, ix)
    oix = oracle.build_oracle_index(pdf, from_html=False,
                                    fields=HAYOO_FIELDS)
    return eng, oix


def test_hayoo_schema_declared(hayoo_setup):
    eng, _ = hayoo_setup
    assert set(eng.date_fields) == {"upload", "indexed"}
    assert eng.field_weights["name"] == 3.0
    assert eng.field_weights["type"] == 0.0
    # default (unscoped) set excludes the NoDefault contexts
    assert "category" not in eng.default_fields
    assert "name" in eng.default_fields


@pytest.mark.parametrize("q", HAYOO_QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_hayoo_schema_rank_identity(hayoo_setup, q, mode):
    eng, oix = hayoo_setup
    got = eng.search(q, k=25, mode=mode)
    want = oracle.search(oix, q, k=25)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


def test_context_drilldowns(hayoo_setup):
    """The reference's typed ContextQuery family rendered into the
    query language and evaluated over the 18-context index
    (Common.hs:453-482)."""
    from hayoo_spark.query import canned

    eng, oix = hayoo_setup
    assert canned.context_queries("package") == (
        "reverse-dependencies", "package-modules", "package-datatypes",
        "packages-by-author")
    assert canned.context_queries("function") == (
        "related-module", "related-package")

    # package-datatypes: data decls of pkg1 only
    q = canned.render_context("package-datatypes", package="pkg1")
    got = eng.search(q, k=50)
    assert got
    want = oracle.search(oix, q, k=50)
    assert [u for u, _ in got] == [u for u, _ in want]
    # reverse-dependencies: docs whose dependencies mention pkg2
    q = canned.render_context("reverse-dependencies", package="pkg2")
    hits = {u for u, _ in eng.search(q, k=100)}
    assert hits  # corpus wires dependencies = "base pkg{(i+1)%5}"
    # module-content over two modules of a package
    q = canned.render_context(
        "module-content", package="pkg1",
        modules=("Acme.Mod1.Sub1", "Acme.Mod2.Sub0"))
    assert eng.search(q, k=50) == [
        (u, s) for u, s in oracle.search(oix, q, k=50)]
    # packages-by-author: comma-split author list
    q = canned.render_context("packages-by-author",
                              author="author1, author2")
    assert eng.search(q, k=100)


def test_hayoo_name_weight_outranks_description(hayoo_setup):
    """A name hit (weight 3.0) outranks a description hit (0.3) —
    the reference's ranking contract for its schema."""
    eng, _ = hayoo_setup
    hits = eng.search("foobar7", k=10)
    assert hits and hits[0][0].endswith("#v:fn7")


# ------------------------------------------------ scoped case-sensitivity

#: HAYOO_FIELDS plus a case-sensitive twin of the name context — the
#: reference's contexts preserve case with the query flavor picking
#: qFullWord vs qWordNoCase (hayoo-server/src/Hayoo/App.hs:187-200);
#: this engine's convention is an explicit `<field>_cs` twin context
#: that `name:!MapM` targets (fields.py token_mode docs)
from hayoo_spark.index.fields import FieldSpec  # noqa: E402

CS_TWIN_FIELDS = HAYOO_FIELDS + (
    FieldSpec("name_cs", 3.0, False, "name", token_mode="tokens_cs"),)

CS_QUERIES = [
    "name:!fooBar7",          # exact case hit
    "name:!FooBar7",          # wrong case -> no hit
    "name:!foobar7",          # wrong case -> no hit
    "name:!fooB*",            # case-sensitive prefix over the twin
    "name:!FooB*",            # wrong-case prefix -> no hit
    "name:!fooBar7~",         # CS fuzzy (edit distance <= 1)
    "name:!fooBar7 OR walrus",
    "name:fooBar7",           # plain scoped stays no-case
]


@pytest.fixture(scope="module")
def cs_setup(spark, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    pdf = _decl_corpus()
    d = tmp_path_factory.mktemp("hayoocs")
    src = str(d / "pages.parquet")
    pdf.to_parquet(src, index=False)
    ix = str(d / "ix")
    build_index(spark, src, ix, n_segments=4, salt_df_threshold=64,
                fields=CS_TWIN_FIELDS)
    eng = SearchEngine(spark, ix)
    oix = oracle.build_oracle_index(pdf, from_html=False,
                                    fields=CS_TWIN_FIELDS)
    return eng, oix


@pytest.mark.parametrize("q", CS_QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_scoped_case_sensitive_rank_identity(cs_setup, q, mode):
    eng, oix = cs_setup
    got = eng.search(q, k=25, mode=mode)
    want = oracle.search(oix, q, k=25)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


def test_scoped_case_sensitive_semantics(cs_setup):
    eng, _ = cs_setup
    assert eng.search("name:!fooBar7", k=5)          # exact case matches
    assert eng.search("name:!FooBar7", k=5) == []    # wrong case: nothing
    assert eng.search("name:!foobar7", k=5) == []
    # the no-case scoped flavor is unaffected (dictionary is lowercase)
    assert eng.search("name:FOOBAR7", k=5) == eng.search("name:foobar7", k=5)
    assert eng.search("name:foobar7", k=5)
    # prefix flavor composes
    assert eng.search("name:!fooB*", k=30)
    assert eng.search("name:!FooB*", k=5) == []
