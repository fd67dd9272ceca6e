"""Relational BM25 executor — pure DataFrame ops, no custom physics.

The declarative twin of the segment/WAND engine: tokenize -> explode ->
tf/df/dl aggregates -> join -> score -> groupBy(doc).sum.  Catalyst gets
full visibility (predicate pushdown on the term filter, partial
aggregation, broadcast of the tiny stats/df sides), which makes this the
right surface for SQL-oracle parity checks and for ad-hoc corpora that
have no prebuilt index (SURVEY.md §7 Phase 1 "postings v0").

Scores are returned both exact (`score`) and as `score_x1e4` —
``CAST(ROUND(score*10000) AS BIGINT)`` — the integer form is what the
cross-engine value-hash compares, eliminating float-representation
drift between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokens_col

K1 = 1.2
B = 0.75


def corpus_tokens(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """(key, term, tf, dl) — the logical postings relation."""
    toks = docs.select(F.col(key), tokens_col(text).alias("toks"))
    toks = toks.select(key, F.size("toks").alias("dl"), F.explode("toks").alias("term"))
    return toks.groupBy(key, "dl", "term").agg(F.count("*").alias("tf"))


def corpus_stats(tf: DataFrame, key: str = "doc_id"):
    """(N, avgdl) computed over distinct docs of the tf relation.

    Note: docs whose token list is empty do not appear in `tf`; callers
    that need empty docs counted must pass a docs-level dl relation.
    """
    dl = tf.select(key, "dl").distinct()
    row = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def bm25_expr(n_docs: int, avgdl: float):
    """BM25 contribution of one (doc, term) row given tf, dl, df columns."""
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    num = F.col("tf").cast("double") * (K1 + 1.0)
    den = F.col("tf").cast("double") + K1 * (1.0 - B + B * F.col("dl").cast("double") / avgdl)
    return idf * num / den


def score_terms(
    tf: DataFrame,
    terms: list[str] | None,
    key: str = "doc_id",
    mode: str = "or",
    prefix: str | None = None,
    stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Score docs for a term set (OR-sum) or require all (AND).

    ``stats`` = precomputed (n_docs, avgdl): callers issuing many
    queries over one corpus pass a memoized value so each query does
    not re-collect corpus stats (a full tf scan + driver round-trip).

    -> (key, score double, score_x1e4 bigint, n_terms)
    """
    n_docs, avgdl = stats if stats is not None else corpus_stats(tf, key)
    if prefix is not None:
        sel = tf.filter(F.col("term").startswith(prefix))
    else:
        sel = tf.filter(F.col("term").isin(terms))
    # df of a term = its (doc, term) row count, so the df relation only
    # needs the SELECTED rows — aggregating the whole tf relation per
    # query (the old shape) scanned the entire corpus vocabulary to
    # broadcast a handful of df values.  Values are identical: terms
    # outside the selection never join.
    df_rel = sel.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        sel.join(F.broadcast(df_rel), "term")
        .withColumn("contrib", bm25_expr(n_docs, avgdl))
        .groupBy(key)
        .agg(F.sum("contrib").alias("score"),
             F.countDistinct("term").alias("n_terms"))
    )
    if mode == "and" and terms:
        scored = scored.filter(F.col("n_terms") == len(terms))
    return scored.select(
        key,
        F.col("score"),
        F.round(F.col("score") * 10000).cast("bigint").alias("score_x1e4"),
        F.col("n_terms"),
    )


def duckdb_bm25_sql(
    table: str,
    terms: list[str] | None,
    key: str = "doc_id",
    mode: str = "or",
    prefix: str | None = None,
    text_col: str = "text",
    token_re: str = "[a-z0-9_]+",
    min_len: int = 2,
) -> str:
    """DuckDB SQL equivalent of score_terms (same tokenizer, same BM25)."""
    if prefix is not None:
        pred = f"tf.term LIKE '{prefix}%'"
    else:
        quoted = ", ".join(f"'{t}'" for t in terms)
        pred = f"tf.term IN ({quoted})"
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" and terms else ""
    return f"""
WITH toks AS (
  SELECT {key}, t.term
  FROM {table}, UNNEST(regexp_extract_all(lower({text_col}), '{token_re}')) AS t(term)
  WHERE length(t.term) >= {min_len}
),
tf AS (SELECT {key}, term, count(*) AS tf FROM toks GROUP BY {key}, term),
dl AS (SELECT {key}, count(*) AS dl FROM toks GROUP BY {key}),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT tf.{key},
       sum( ln(1.0 + (stats.n - dfr.df + 0.5)/(dfr.df + 0.5))
            * tf.tf * ({K1} + 1.0)
            / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) ) AS score,
       CAST(ROUND(sum( ln(1.0 + (stats.n - dfr.df + 0.5)/(dfr.df + 0.5))
            * tf.tf * ({K1} + 1.0)
            / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl)) ) * 10000) AS BIGINT)
         AS score_x1e4,
       count(DISTINCT tf.term) AS n_terms
FROM tf
JOIN dfr USING (term)
JOIN dl USING ({key})
CROSS JOIN stats
WHERE {pred}
GROUP BY tf.{key}
{having}
"""
