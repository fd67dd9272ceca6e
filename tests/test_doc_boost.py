"""Per-document static weight (adWght analogue, SURVEY.md §2.6):
score = query_boost x idf x tf_norm x doc_boost, rank-identical to the
oracle, and block-max pruning stays admissible under boosts."""

import numpy as np
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.index.builder import build_index
from hayoo_spark.query.engine import SearchEngine

BOOST_QUERIES = ["baba", "bibaba OR nibaba", "baba AND bibaba", "bib*",
                 '"baba baba"', "baba^2 OR nibaba"]


@pytest.fixture(scope="module")
def boosted(spark, tmp_path_factory):
    pages = fixtures.make_pages(200)
    rng = np.random.RandomState(11)
    # skewed boosts incl. a 50x outlier — stresses bound admissibility
    pages["boost"] = rng.uniform(0.1, 2.0, size=len(pages))
    pages.loc[pages.index[7], "boost"] = 50.0
    d = tmp_path_factory.mktemp("boosted")
    p = d / "pages.parquet"
    pages.to_parquet(p, index=False)
    ix = str(d / "ix")
    build_index(spark, str(p), ix, n_segments=4, salt_df_threshold=64,
                n_salts=4)
    return pages, ix


def test_boosted_rank_identical(spark, boosted):
    pages, ixd = boosted
    orc = oracle.build_oracle_index(pages, from_html=False)
    eng = SearchEngine(spark, ixd)
    for mode in ("local", "spark"):
        for q in BOOST_QUERIES:
            got = eng.search(q, k=20, mode=mode)
            want = oracle.search(orc, q, k=20)
            assert [u for u, _ in got] == [u for u, _ in want], (mode, q)
            assert all(abs(g[1] - w[1]) < 1e-6 for g, w in zip(got, want)), (mode, q)


def test_outlier_boost_doc_surfaces(spark, boosted):
    pages, ixd = boosted
    eng = SearchEngine(spark, ixd)
    boosted_url = pages.iloc[7]["url"]
    # the 50x doc should dominate any query containing one of its terms
    from hayoo_spark.analysis import tokenize_py
    term = tokenize_py(pages.iloc[7]["text"])[0]
    top = eng.search(term, k=1)
    assert top[0][0] == boosted_url


def test_boostless_index_defaults_to_one(spark, engine, oracle_ix):
    # pre-existing fixture index has no boost column; scores unchanged
    got = engine.search("baba", k=5)
    want = oracle.search(oracle_ix, "baba", k=5)
    assert [u for u, _ in got] == [u for u, _ in want]
