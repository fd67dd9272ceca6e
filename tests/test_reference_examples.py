"""The reference's OWN example query set (/root/reference/Examples.md)
run end-to-end over a Hackage-shaped declaration corpus on the full
schema: every documented query form parses, evaluates rank-identically
to the oracle in both modes, and finds the documented target."""

import pandas as pd
import pytest

from hayoo_spark import oracle
from hayoo_spark.index.fields import HAYOO_FIELDS, FieldSpec

# HAYOO_FIELDS + the case-sensitive context the `!word` flavor targets
FIELDS = HAYOO_FIELDS + (FieldSpec("text_cs", 1.0, False, "body_cs"),)


def _corpus():
    def row(name, pkg, mod, sig, text, upload, fct="function"):
        return {
            "url": f"https://hackage.test/{pkg}/docs#v:{name}",
            "text": text, "name": name, "package": pkg, "module": mod,
            "signature": sig, "fct_type": fct,
            "author": "core team", "category": "data",
            "dependencies": "ghc-prim", "maintainer": "core",
            "synopsis": f"{pkg} synopsis", "source": "", "version": "1.0",
            "upload_ts": pd.Timestamp(upload),
            "indexed_ts": pd.Timestamp("2015-06-01"),
        }

    rows = [
        row("mapM", "base", "Control.Monad",
            "(a -> m b) -> t a -> m (t b)",
            "mapM maps each element of a structure to a monadic action",
            "2014-03-01"),
        row("foldM", "base", "Control.Monad",
            "(b -> a -> m b) -> b -> t a -> m b",
            "foldM is a monadic fold", "2014-04-01"),
        row("map", "base", "GHC.List", "(a -> b) -> [a] -> [b]",
            "Map each element of the list", "2013-05-01"),
        row("map", "vector", "Data.Vector", "(a -> b) -> v a -> v b",
            "map over vectors", "2015-02-01"),
        row("idf", "extra", "Extra.Id", "a -> a",
            "the identity-like function", "2014-07-01"),
        row("bracket", "base", "Control.Exception",
            "IO a -> (a -> IO b) -> (a -> IO c) -> IO c",
            "allocate run release", "2014-08-01"),
        row("base", "base", "", "", "the base package docs",
            "2014-01-15", fct="package"),
    ]
    pdf = pd.DataFrame(rows)
    pdf["lang"] = "en"
    pdf["warc_ts"] = pd.Timestamp("2024-01-01")
    for c in ("upload_ts", "indexed_ts", "warc_ts"):
        pdf[c] = pdf[c].astype("datetime64[us]")
    return pdf


#: every query form Examples.md documents, verbatim semantics
EXAMPLE_QUERIES = [
    "name:mapM",
    "package:base",
    "a -> a",                      # signature search
    "module:Control.Exception",
    "package:base mapM",           # implicit AND combination
    "mapM OR foldM",
    "map AND NOT package:base",
    '"map each element"',          # phrase
    "!mapM",                       # case-sensitive flavor
    "upload:[2014-01-01T00:00:00 TO 2015-01-01T00:00:00]",
]


@pytest.fixture(scope="module")
def ref_setup(spark, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    pdf = _corpus()
    d = tmp_path_factory.mktemp("refex")
    src = str(d / "pages.parquet")
    pdf.to_parquet(src, index=False)
    ix = str(d / "ix")
    build_index(spark, src, ix, n_segments=2, salt_df_threshold=64,
                fields=FIELDS)
    eng = SearchEngine(spark, ix)
    oix = oracle.build_oracle_index(pdf, from_html=False, fields=FIELDS)
    return eng, oix


@pytest.mark.parametrize("q", EXAMPLE_QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_examples_rank_identity(ref_setup, q, mode):
    eng, oix = ref_setup
    got = eng.search_frontend(q, k=20, mode=mode)
    want = oracle.search_frontend(oix, q, k=20)
    assert [u for u, _ in got] == [u for u, _ in want], (q, mode)
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


def test_examples_find_documented_targets(ref_setup):
    eng, _ = ref_setup

    def urls(q):
        return [u for u, _ in eng.search_frontend(q, k=20)]

    assert urls("name:mapM") and urls("name:mapM")[0].endswith("#v:mapM")
    assert all("/base/" in u for u in urls("package:base"))
    # signature: idf :: a -> a is the exact match
    assert urls("a -> a")[0].endswith("#v:idf")
    assert urls("module:Control.Exception") == \
        ["https://hackage.test/base/docs#v:bracket"]
    assert urls("package:base mapM")[0].endswith("#v:mapM")
    both = set(urls("mapM OR foldM"))
    assert {u.rsplit(":", 1)[-1] for u in both} >= {"mapM", "foldM"}
    # map outside base: only the vector one
    notbase = urls("map AND NOT package:base")
    assert notbase and all("/base/" not in u for u in notbase)
    assert urls('"map each element"') == \
        ["https://hackage.test/base/docs#v:map"]
    assert urls("!mapM") and urls("!mapM")[0].endswith("#v:mapM")
    # upload range covers 2014 uploads only
    up = urls("upload:[2014-01-01T00:00:00 TO 2015-01-01T00:00:00]")
    assert up and all("vector" not in u for u in up)
    assert not [u for u in up if u.endswith("#v:map")
                and "/base/" in u]  # 2013 upload excluded
