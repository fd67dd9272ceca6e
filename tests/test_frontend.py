"""Q9 packaged frontend planner + scored autocomplete
(hayoo-server/src/Hayoo/App.hs:101-111,144-200)."""

import pytest

from hayoo_spark import oracle
from hayoo_spark.query import plan as P
from hayoo_spark.query.parser import parse, parse_frontend


def test_frontend_std_branch_only_when_parse_succeeds():
    # reference defq gating (App.hs:155-164): the AND-of-words default
    # query appears ONLY when both the sig and std parsers fail, so a
    # parsable non-signature query IS its std parse
    ast = parse_frontend("baba OR bibaba")
    assert ast == parse("baba OR bibaba")


def test_frontend_degrades_on_parse_error():
    # unbalanced paren: std drops, defq = AND of whitespace words
    # (quotes stripped, no boost — App.hs:159-163)
    ast = parse_frontend("baba AND (")
    assert ast == P.And((P.Term("baba"), P.Term("AND"), P.Term("(")))
    ast = parse_frontend('"ba ( ba"')
    # quoted phrase parses as std; defq never fires
    assert ast == parse('"ba ( ba"')
    assert parse_frontend("") == P.And(())


def test_frontend_defq_strips_quotes():
    ast = parse_frontend('"baba" AND (')
    assert ast == P.And((P.Term("baba"), P.Term("AND"), P.Term("(")))


QUERIES = [
    "baba",                     # plain word: std branch only
    "baba bibaba",              # implicit AND
    "baba OR nibaba",
    "lang:en AND baba",         # fielded std
    "bib* AND nibaba",
    '"baba baba" OR rasase',
    "baba AND (",               # parse error -> defq only
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


def test_frontend_plain_word_scores_match_std(engine):
    """With the reference defq gating a parsable plain query goes
    through the std branch alone — frontend scores equal std scores."""
    std = engine.search("baba", k=5)
    fe = engine.search_frontend("baba", k=5)
    assert std == fe


def test_autocomplete_scored_parity(engine, oracle_ix):
    for prefix in ["ba", "bi", "so", "zz"]:
        got = engine.autocomplete(prefix, n=10)
        want = oracle.autocomplete(oracle_ix, prefix, n=10)
        assert got == want, prefix
