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
    # (quotes stripped, no boost, LOWERCASED like qWordNoCase against
    # the all-lowercase dictionary — App.hs:159-163; ADVICE r4)
    ast = parse_frontend("baba AND (")
    assert ast == P.And((P.Term("baba"), P.Term("and"), P.Term("(")))
    ast = parse_frontend('"ba ( ba"')
    # quoted phrase parses as std; defq never fires
    assert ast == parse('"ba ( ba"')
    assert parse_frontend("") == P.And(())


def test_frontend_defq_strips_quotes():
    ast = parse_frontend('"baba" AND (')
    assert ast == P.And((P.Term("baba"), P.Term("and"), P.Term("(")))


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


PRINT_ROUNDTRIP = [
    "baba",
    "baba AND bibaba",
    "baba OR bibaba OR nibaba",
    "baba AND NOT nibaba",
    "(baba OR bibaba) AND nibaba",
    "bib* AND nibaba",
    "baba~",
    '"baba baba" OR rasase',
    "lang:en AND baba",
    "title:walrus",
    "!Foo AND baba",
    "baba^2.5",
    "(baba OR bibaba)^0.5",
    "warc_ts:[2024-01-01 TO 2024-07-01] AND baba",
]


@pytest.mark.parametrize("q", PRINT_ROUNDTRIP)
def test_print_query_roundtrip(q):
    """printQuery output re-parses to the identical AST."""
    from hayoo_spark.query.parser import print_query

    ast = parse(q)
    assert parse(print_query(ast)) == ast, print_query(ast)


def test_complete_queries_substitutes_last_word():
    """completeQueries semantics (Common.hs:402-415): the LAST word is
    replaced by each completion and the WHOLE query re-printed."""
    from hayoo_spark.query.parser import complete_queries

    ast = parse("baba AND bib")
    assert complete_queries(ast, ["bibaba", "bibi"]) == [
        "baba AND bibaba", "baba AND bibi"]
    # prefix marker consumed by the completion
    ast = parse("baba OR bib*")
    assert complete_queries(ast, ["bibaba"]) == ["baba OR bibaba"]
    # scoped last word keeps its context; boost survives
    ast = parse("baba AND title:wal^2")
    assert complete_queries(ast, ["walrus"]) == [
        "baba AND title:walrus^2"]
    # last word inside AND NOT's right side
    ast = parse("baba AND NOT bib")
    assert complete_queries(ast, ["bibaba"]) == ["baba AND NOT bibaba"]


COMPLETE_QUERIES = [
    "bi",                      # single word
    "baba AND bi",             # last word of an AND
    "baba OR bi*",             # prefix-marked last word
    "baba AND NOT bi",         # completion in the negated branch
    "nosuchprefix_zz",         # no completions
    "baba AND (",              # parse error -> raw last-word fallback
    "",                        # empty
    "a -> b",                  # signature query, no signature context
]


@pytest.mark.parametrize("q", COMPLETE_QUERIES)
def test_autocomplete_queries_parity(engine, oracle_ix, q):
    got = engine.autocomplete_queries(q, n=10)
    want = oracle.autocomplete_queries(oracle_ix, q, n=10)
    assert got == want, q


def test_autocomplete_queries_shapes(engine):
    out = engine.autocomplete_queries("baba AND bi", n=5)
    assert out and all(o.startswith("baba AND bi") for o in out)
    # every completion is itself a parsable query
    for o in out:
        parse(o)
