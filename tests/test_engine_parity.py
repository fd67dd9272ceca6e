"""The correctness gate: engine top-k rank-identical to the exact oracle
over the full reference query set (BASELINE.json north rule)."""

import numpy as np
import pytest

from hayoo_spark import fixtures, oracle
from tests.conftest import N_DOCS

QUERIES = fixtures.make_queries(N_DOCS)


def _check(engine, oracle_ix, query, k, page, mode):
    got = engine.search(query, k=k, page=page, mode=mode)
    want = oracle.search(oracle_ix, query, k=k, page=page)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"rank mismatch for {query!r} [{mode}]:\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, f"score mismatch {query!r} {gu}: {gs} vs {ws}"


@pytest.mark.parametrize(
    "q", QUERIES, ids=[f"q{q['query_id']}_{q['kind']}" for q in QUERIES])
def test_reference_query_set_local(engine, oracle_ix, q):
    """Serving-tier (pyarrow) mode: full reference set, rank-identical."""
    _check(engine, oracle_ix, q["query"], q["k"], q["page"], "local")


@pytest.mark.parametrize(
    "q", QUERIES[::4], ids=[f"q{q['query_id']}_{q['kind']}" for q in QUERIES[::4]])
def test_reference_query_set_spark(engine, oracle_ix, q):
    """Distributed (grouped-map) mode: same evaluator, Spark merge —
    sampled every 4th query to bound suite time."""
    _check(engine, oracle_ix, q["query"], q["k"], q["page"], "spark")


FIELD_MIX = [q for q in QUERIES if q["kind"] == "field_mix"]


@pytest.mark.parametrize(
    "q", FIELD_MIX, ids=[f"q{q['query_id']}_{q['kind']}" for q in FIELD_MIX])
def test_filter_branch_queries_spark(engine, oracle_ix, q):
    """Spark mode must scan segments that hold none of the scoring
    terms' postings when the AST has filter-only branches (ADVICE r1) —
    these queries are guaranteed in the spark sample, not left to the
    every-4th stride."""
    _check(engine, oracle_ix, q["query"], q["k"], q["page"], "spark")


def test_autocomplete_parity(engine, oracle_ix):
    for prefix in ["ba", "bi", "so", "zz"]:
        got = engine.autocomplete(prefix, n=10)
        want = oracle.autocomplete(oracle_ix, prefix, n=10)
        assert got == want, f"autocomplete({prefix!r}): {got} vs {want}"


def test_stats_match_oracle(engine, oracle_ix):
    assert engine.n_docs == oracle_ix.n_docs
    assert set(engine.avgdl) == set(oracle_ix.avgdl)
    for f in engine.avgdl:
        assert np.isclose(engine.avgdl[f], oracle_ix.avgdl[f])
