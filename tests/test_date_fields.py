"""Date-typed index contexts (reference ctDate,
hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:111,120,133-137): a declared
date field is stored per doc, carries no postings, and is queried via
``field:[A TO B]`` with TRUNCATABLE ISO-prefix endpoints — `2014-02`
covers the whole month.  Engine (both modes) must match the exact
oracle; legacy warc_ts ranges keep raw-instant [lo, hi) semantics."""

import pandas as pd
import pytest

from hayoo_spark import fixtures, oracle
from hayoo_spark.index.fields import FieldSpec
from hayoo_spark.query.plan import iso_prefix_bounds

FIELDS = (
    FieldSpec("text", 1.0, True, "body"),
    FieldSpec("title", 2.0, True, "title"),
    # the date context under test: stored column pub_ts, range-only
    FieldSpec("pub", weight=0.0, default=False, source="pub_ts",
              ftype="date"),
)

QUERIES = [
    "pub:[2024-01 TO 2024-03] AND baba",
    "pub:[2023 TO 2023] AND baba",
    "pub:[2024-02-01 TO 2024-02-15]",
    "pub:[2024-05 TO 2024-06] OR bibaba",
    "baba AND NOT pub:[2024-01 TO 2024-06]",
    # legacy warc_ts semantics unchanged alongside
    "warc_ts:[2024-03-01 TO 2024-07-01] AND pub:[2024-01 TO 2024-04]",
    # range on an undeclared field matches nothing
    "nosuchfield:[2024 TO 2024] OR baba",
]


def test_iso_prefix_bounds():
    lo, hi = iso_prefix_bounds("2014-02", "2014-08")
    assert lo == pd.Timestamp("2014-02-01")
    assert hi == pd.Timestamp("2014-09-01")
    lo, hi = iso_prefix_bounds("2014", "2014")
    assert (lo, hi) == (pd.Timestamp("2014-01-01"), pd.Timestamp("2015-01-01"))
    lo, hi = iso_prefix_bounds("2014-02-03", "2014-02-03")
    assert (lo, hi) == (pd.Timestamp("2014-02-03"), pd.Timestamp("2014-02-04"))


@pytest.fixture(scope="module")
def date_pages():
    return fixtures.make_pages(250)


@pytest.fixture(scope="module")
def date_oracle(date_pages):
    return oracle.build_oracle_index(date_pages, from_html=True,
                                     fields=FIELDS)


@pytest.fixture(scope="module")
def date_engine(spark, date_pages, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("dateix")
    out = d / "pages.parquet"
    date_pages.to_parquet(out, index=False)
    ix = str(d / "ix")
    build_index(spark, str(out), ix, n_segments=4, fields=FIELDS)
    return SearchEngine(spark, ix)


def test_date_field_declared(date_engine):
    assert date_engine.date_fields == ("pub",)
    # no postings/weights/norms for the date context
    assert "pub" not in date_engine.field_weights
    assert "pub" not in date_engine.avgdl


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_date_range_rank_identity(date_engine, date_oracle, q, mode):
    got = date_engine.search(q, k=25, mode=mode)
    want = oracle.search(date_oracle, q, k=25)
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")
    for (gu, gs), (wu, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6, (q, gu)


WARC_FIELDS = (
    FieldSpec("text", 1.0, True, "body"),
    # date context NAMED after the known warc_ts doc column (ADVICE
    # r3): must serve from the typed column, with ISO-prefix (declared
    # date) semantics taking precedence over the legacy raw-instant path
    FieldSpec("warc_ts", weight=0.0, default=False, source="warc_ts",
              ftype="date"),
)

WARC_QUERIES = [
    "warc_ts:[2024-03 TO 2024-05] AND baba",
    "warc_ts:[2024 TO 2024]",
]


@pytest.fixture(scope="module")
def warc_engine(spark, date_pages, tmp_path_factory):
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    d = tmp_path_factory.mktemp("warcix")
    out = d / "pages.parquet"
    date_pages.to_parquet(out, index=False)
    ix = str(d / "ix")
    build_index(spark, str(out), ix, n_segments=4, fields=WARC_FIELDS)
    return SearchEngine(spark, ix)


@pytest.mark.parametrize("q", WARC_QUERIES)
@pytest.mark.parametrize("mode", ["local", "spark"])
def test_warc_ts_named_date_context(warc_engine, date_pages, q, mode):
    ora = oracle.build_oracle_index(date_pages, from_html=True,
                                    fields=WARC_FIELDS)
    got = warc_engine.search(q, k=25, mode=mode)
    want = oracle.search(ora, q, k=25)
    assert got, q  # the fixture has 2024 timestamps: must match docs
    assert [u for u, _ in got] == [u for u, _ in want], (
        f"{q!r} [{mode}]\n got={got[:5]}\nwant={want[:5]}")


def test_prefix_truncation_widens_range(date_engine, date_oracle):
    """[2024-02 TO 2024-02] must cover the whole month — strictly more
    docs than the raw-instant interpretation [2024-02-01, 2024-02-01)."""
    whole_month = date_engine.search("pub:[2024-02 TO 2024-02]", k=10**6)
    assert whole_month, "fixture must have pub_ts dates in 2024-02"
    first_day = date_engine.search("pub:[2024-02-01 TO 2024-02-01]", k=10**6)
    assert len(whole_month) > len(first_day)
