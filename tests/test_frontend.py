"""Q9 packaged frontend planner + scored autocomplete
(hayoo-server/src/Hayoo/App.hs:101-111,144-200)."""

import pytest

from hayoo_spark import oracle
from hayoo_spark.query import plan as P
from hayoo_spark.query.parser import (
    FRONTEND_FALLBACK_BOOST, parse, parse_frontend,
)


def test_frontend_unions_std_and_fallback():
    ast = parse_frontend("baba OR bibaba")
    assert isinstance(ast, P.Or) and len(ast.children) == 2
    std, fb = ast.children
    assert std == parse("baba OR bibaba")
    assert fb == P.And((P.Term("baba", boost=FRONTEND_FALLBACK_BOOST),
                        P.Term("bibaba", boost=FRONTEND_FALLBACK_BOOST)))


def test_frontend_strips_connectives_in_fallback():
    ast = parse_frontend("baba AND NOT bibaba")
    fb = ast.children[1]
    assert [t.term for t in fb.children] == ["baba", "bibaba"]


def test_frontend_degrades_on_parse_error():
    # unbalanced paren: the std branch drops, the word query survives
    ast = parse_frontend("baba AND (")
    assert ast == P.And((P.Term("baba", boost=FRONTEND_FALLBACK_BOOST),))
    assert parse_frontend("(((") == P.And(())


QUERIES = [
    "baba",                     # plain word: std == fallback shape
    "baba bibaba",              # implicit AND
    "baba OR nibaba",
    "lang:en AND baba",         # fielded std, word fallback adds terms
    "bib* AND nibaba",
    '"baba baba" OR rasase',
    "baba AND (",               # parse error -> fallback only
]


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_frontend_rank_identity(engine, oracle_ix, q, mode):
    got = engine.search_frontend(q, k=15, mode=mode)
    want = oracle.search_frontend(oracle_ix, q, k=15)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


def test_frontend_fallback_boost_applied(engine):
    """A plain word query through the frontend planner scores
    (1 + FRONTEND_FALLBACK_BOOST)x the std query (union sums both
    branches — Hunt's union-with-score-sum semantics)."""
    std = engine.search("baba", k=5)
    fe = engine.search_frontend("baba", k=5)
    assert [u for u, _ in std] == [u for u, _ in fe]
    for (u1, s1), (u2, s2) in zip(std, fe):
        assert abs(s2 - s1 * (1 + FRONTEND_FALLBACK_BOOST)) < 1e-9


def test_autocomplete_scored_parity(engine, oracle_ix):
    for prefix in ["ba", "bi", "so", "zz"]:
        got = engine.autocomplete(prefix, n=10)
        want = oracle.autocomplete(oracle_ix, prefix, n=10)
        assert got == want, prefix
