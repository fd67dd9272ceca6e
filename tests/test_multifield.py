"""Multi-field (context) indexing: rank-identity vs the exact oracle
with weighted fields, a weight-0 filter-only field, field-scoped terms,
and the `!` case-sensitive flavor (reference IndexSchema.hs:103-137)."""

import numpy as np
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.index.fields import FieldSpec

N_DOCS = 300

FIELDS = (
    FieldSpec("title", weight=2.5, default=True, source="title"),
    FieldSpec("text", weight=1.0, default=True, source="body"),
    # weight-0 filter-only context (IndexSchema.hs:119 `type` semantics)
    FieldSpec("tag", weight=0.0, default=False, source="tag"),
    # case-sensitive flavor, searched only via `!word` / text_cs:
    FieldSpec("text_cs", weight=1.0, default=False, source="body_cs"),
    # hierarchy/name-part expansion analogue (A2/A3): url segments
    FieldSpec("url_terms", weight=0.5, default=False, source="url_terms"),
)

QUERIES = [
    # unscoped terms score title (w=2.5) + body (w=1.0)
    "baba", "bibaba", "nibaba AND baba", "bibaba OR nibaba",
    "baba AND NOT nibaba", "bib*", '"baba baba"',
    # field-scoped scoring terms
    "title:baba", "title:bib*", "title:baba OR nibaba",
    # weight-0 filter field: restricts matches, adds no score
    "tag:alpha AND baba", "tag:beta AND bibaba", "tag:gamma",
    "tag:alpha AND NOT baba",
    # case-sensitive flavor incl. prefix/fuzzy markers (Q1)
    "!CamelCase", "!camelcase", "!CAMELCASE", "!plainword",
    "!CamelCase OR baba", "camelcase", "!Camel*", "!camel*",
    "!CamelCasx~",
    # hierarchy/name-split field (A2/A3): url host+path segments
    "url_terms:example0", "url_terms:example0 AND baba",
    "url_terms:exam*", "url_terms:edge OR bibaba",
    # boosts & paging interplay
    "title:baba^2 OR bibaba", "baba^0.5 AND bibaba",
    # r5: shapes newly routed through the block-max pruned path —
    # phrase under a boolean, paren OR-groups under AND, scoped
    # scoring term × filter drill-downs (VERDICT r4 #1)
    '"baba baba" AND bibaba', 'tag:alpha AND "baba baba"',
    "(bibaba OR nibaba) AND tag:alpha",
    "title:baba AND tag:alpha", "nibaba AND title:baba",
    "(baba OR bibaba) AND nibaba",
    "tag:alpha AND baba AND NOT nibaba",
    'title:baba AND "baba baba"^2',
    # r6: phrase case/scope flavors (Hunt QPhrase QCase; scoped
    # phrases per setContexts [c] . qPhrase, App/Types.hs:175)
    '!"CamelCase camelcase"',       # CS phrase, adjacent in body_cs
    '!"CAMELCASE CamelCase"',       # CS phrase, later adjacency
    '!"CamelCase CamelCase"',       # no CS adjacency -> empty
    '!"camelcase camelcase"',       # folded pair absent in CS stream
    '"camelcase camelcase"',        # no-case: all variants fold
    'title:"baba baba"',            # scoped phrase
    '!"CamelCase camelcase" OR baba',
    '!"CamelCase camelcase"^3 OR "baba baba"',
]


@pytest.fixture(scope="module")
def mf_pages():
    return fixtures.make_pages(N_DOCS)


@pytest.fixture(scope="module")
def mf_oracle(mf_pages):
    return oracle.build_oracle_index(mf_pages, from_html=True, fields=FIELDS)


@pytest.fixture(scope="module")
def mf_engine(spark, mf_pages, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("mfix")
    out = d / "pages.parquet"
    mf_pages.to_parquet(out, index=False)
    ix = str(d / "ix")
    build_index(spark, str(out), ix, n_segments=4, salt_df_threshold=64,
                n_salts=4, fields=FIELDS)
    return SearchEngine(spark, ix)


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_multifield_rank_identity(mf_engine, mf_oracle, q, mode):
    got = mf_engine.search(q, k=20, mode=mode)
    want = oracle.search(mf_oracle, q, k=20)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"rank mismatch for {q!r} [{mode}]:\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, f"score mismatch {q!r} {gu}: {gs} vs {ws}"


def test_title_weight_changes_ranking(mf_engine, mf_oracle):
    """A term in a doc's title must outrank the same term body-only when
    everything else is comparable: verify the title field actually
    contributes weighted score (not just matching)."""
    got = dict(mf_engine.search("baba", k=10**6))
    # title terms are the first 3 body tokens, so title matches exist
    pairs = mf_oracle.postings.get(("title", "baba"), ())
    assert pairs, "fixture must have title matches for the head term"
    d0 = pairs[0][0]
    url = mf_oracle.urls[d0]
    body_only = mf_oracle.bm25("text", "baba", d0,
                               dict(mf_oracle.postings[("text", "baba")]).get(d0, 0))
    assert got[url] > body_only  # title contribution present


def test_weight0_field_scores_zero(mf_engine, mf_oracle):
    got = mf_engine.search("tag:alpha", k=5)
    want = oracle.search(mf_oracle, "tag:alpha", k=5)
    assert got == want
    assert all(s == 0.0 for _, s in got)


def test_case_sensitive_distinguishes(mf_oracle, mf_engine):
    """`!CamelCase` and `!CAMELCASE` hit the same doc with different tf;
    unscoped `camelcase` folds all variants."""
    cs1 = mf_engine.search("!CamelCase", k=5)
    cs2 = mf_engine.search("!CAMELCASE", k=5)
    assert cs1 and cs2
    assert cs1[0][0] == "https://edge.org/case" == cs2[0][0]
    assert cs1[0][1] != cs2[0][1]  # tf 2 vs tf 1
    folded = dict(mf_engine.search("camelcase", k=5))
    assert "https://edge.org/case" in folded


def test_case_sensitive_phrase_semantics(mf_engine):
    """`!"w1 w2"` requires case-exact adjacency in the CS stream; the
    no-case phrase folds all case variants (body is
    "CamelCase camelcase CAMELCASE CamelCase plainword")."""
    assert mf_engine.search('!"CamelCase camelcase"', k=5)
    assert mf_engine.search('!"CAMELCASE CamelCase"', k=5)
    assert mf_engine.search('!"CamelCase CamelCase"', k=5) == []
    assert mf_engine.search('!"camelcase camelcase"', k=5) == []
    folded = mf_engine.search('"camelcase camelcase"', k=5)
    assert folded and folded[0][0] == "https://edge.org/case"


def test_field_dictionaries_are_separate(mf_engine):
    """Prefix expansion in title: only title terms; the title dictionary
    is a (strict) subset of the body dictionary on this fixture."""
    title_terms = set(mf_engine._dict["title"][0])
    body_terms = set(mf_engine._dict["text"][0])
    assert title_terms and title_terms < body_terms
    assert set(mf_engine._dict["tag"][0]) == {"alpha", "beta", "gamma"}


def test_autocomplete_weight_folding(mf_engine, mf_oracle):
    """Completions fold field weights (title w=2.5 counts 2.5x body):
    engine == oracle on a weighted schema, and a title-heavy term must
    outrank a body-only term with equal raw df mass."""
    from hayoo_spark import oracle as omod

    for prefix in ["ba", "bi", "ca"]:
        got = mf_engine.autocomplete(prefix, n=10)
        want = omod.autocomplete(mf_oracle, prefix, n=10)
        assert got == want, prefix
        for t, s in got:
            raw_df = sum(len(mf_oracle.postings.get((f, t), ()))
                         for f in mf_oracle.default_fields)
            w_df = sum(mf_oracle.weights[f]
                       * len(mf_oracle.postings.get((f, t), ()))
                       for f in mf_oracle.default_fields)
            assert abs(s - w_df) < 1e-9
            if len(mf_oracle.postings.get(("title", t), ())):
                assert s > raw_df  # title weight actually folded in


def test_fresh_multifield_ub_scale_is_one(mf_engine):
    """A fresh multi-field build has zero stat drift, so every field's
    block-bound admissibility factor must be exactly 1.0 — a cross-field
    factor (max avgdl / min avgdl ~ body/title) would inflate bounds
    30-100x and silently disable block-max pruning (ADVICE r2)."""
    assert set(mf_engine.ub_scale) == {f.name for f in FIELDS}
    assert all(v == 1.0 for v in mf_engine.ub_scale.values()), \
        mf_engine.ub_scale


def test_update_preserves_field_schema(spark, mf_pages, tmp_path_factory,
                                       mf_oracle):
    """Incremental update on a multi-field index keeps the schema (read
    back from stats) and stays rank-identical to a full rebuild."""
    import pandas as pd

    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.update import update_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("mfupd")
    pages = mf_pages.copy()
    p_path = str(d / "pages.parquet")
    pages.to_parquet(p_path, index=False)
    ix = str(d / "ix")
    build_index(spark, p_path, ix, n_segments=4, fields=FIELDS)

    # change one doc's text and bump its warc_ts
    pages2 = pages.copy()
    i = pages2.index[pages2["url"] == "https://edge.org/single"][0]
    pages2.loc[i, "text"] = "solitaryword now has Company"
    pages2.loc[i, "html"] = (
        b"<html><head><title>solitaryword now has</title></head>"
        b"<body><p>solitaryword now has Company</p></body></html>")
    pages2.loc[i, "warc_ts"] = pd.Timestamp("2025-06-01")
    pages2.to_parquet(p_path, index=False)
    update_index(spark, p_path, ix, since_ts="2025-01-01")

    full = str(d / "full")
    build_index(spark, p_path, full, n_segments=4, fields=FIELDS)
    e_upd = SearchEngine(spark, ix)
    e_full = SearchEngine(spark, full)
    for q in ["baba", "title:solitaryword", "!Company", "tag:alpha AND baba"]:
        assert e_upd.search(q, k=10) == e_full.search(q, k=10), q


@pytest.mark.parametrize("q", QUERIES[::3])
def test_rank_identity_with_bound_loop_forced(mf_engine, mf_oracle, q,
                                              monkeypatch):
    """Same oracle parity with the cost router disabled (floor 0), so
    the batched interval bound loop — the cluster-scale route that
    small corpora otherwise never reach — is exercised end-to-end."""
    from hayoo_spark.query import wand as W

    monkeypatch.setattr(W, "EXHAUSTIVE_POSTINGS", 0)
    got = mf_engine.search(q, k=20, mode="local")
    want = oracle.search(mf_oracle, q, k=20)
    assert [u for u, _ in got] == [u for u, _ in want], q
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, f"{q} {gu}"
