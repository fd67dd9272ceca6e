"""SearchEngine facade: AST -> distributed segment scan -> global top-k.

Query lifecycle (SURVEY.md §3.1 Spark equivalent):

1. parse query string -> AST (shared with the oracle);
2. driver-side planning: expand prefixes against the global term
   dictionary (deterministic cap MAX_EXPANSIONS by df desc, term asc —
   never silent), fetch global df for every needed term (predicate
   pushdown on the terms parquet -> a few rows), build the idf map;
3. read postings pruned to the needed terms (parquet pushdown on the
   `term` column; segment partition dirs give scan parallelism);
4. one Arrow grouped-map task per segment evaluates document-at-a-time
   with block-max pruning (query/wand.py) and emits its local top-m
   (m = offset + k) — the per-segment heap of SURVEY.md §2.5 Q10;
5. global merge: ORDER BY score DESC, url ASC LIMIT m — a tiny
   TakeOrderedAndProject over (n_segments × m) rows;
6. offset slice on the driver (paging: offset = page·k,
   hayoo-server/src/Hayoo/App.hs:96-98).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from . import plan as P
from .parser import parse
from .wand import SegmentData, SegmentEvaluator, _flat_terms

RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("score", DoubleType()),
])


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        row = spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]
        self.n_docs = row["n_docs"]
        self.avgdl = float(row["avgdl"])
        self._terms = spark.read.parquet(os.path.join(index_dir, "terms"))

    # ---------------- planning helpers ----------------

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def expand_prefix(self, prefix: str) -> list[str]:
        rows = (
            self._terms
            .filter(F.col("term").startswith(prefix))
            .orderBy(F.col("df").desc(), F.col("term"))
            .limit(P.MAX_EXPANSIONS)
            .collect()
        )
        return [r["term"] for r in rows]

    def _rewrite_prefixes(self, node: P.Node) -> P.Node:
        if isinstance(node, P.Prefix):
            terms = self.expand_prefix(node.prefix)
            return P.Or(tuple(P.Term(t, boost=node.boost) for t in terms))
        if isinstance(node, P.And):
            return P.And(tuple(self._rewrite_prefixes(c) for c in node.children))
        if isinstance(node, P.Or):
            return P.Or(tuple(self._rewrite_prefixes(c) for c in node.children))
        if isinstance(node, P.AndNot):
            return P.AndNot(self._rewrite_prefixes(node.left),
                            self._rewrite_prefixes(node.right))
        return node

    def _idf_map(self, terms: set[str]) -> dict[str, float]:
        if not terms:
            return {}
        rows = self._terms.filter(F.col("term").isin(list(terms))).collect()
        dfs = {r["term"]: r["df"] for r in rows}
        return {t: self.idf(dfs.get(t, 0)) for t in terms}

    # ---------------- search ----------------

    def search(self, query: str, k: int = P.PAGE_SIZE, page: int = 0
               ) -> list[tuple[str, float]]:
        ast = self._rewrite_prefixes(parse(query))
        needed = P.scoring_terms(ast)
        m = (page + 1) * k
        if not needed:
            return self._filter_only(ast, m)[page * k :]

        post = (
            self.spark.read.parquet(os.path.join(self.index_dir, "postings"))
            .filter(F.col("term").isin(list(needed)))
        )
        idf_map = self._idf_map(needed)
        avgdl = self.avgdl
        docs_root = os.path.join(self.index_dir, "docs")
        flat = _flat_terms(ast)

        def eval_segment(key, pdf):
            import pyarrow.parquet as pq

            seg = int(key[0])
            docs_pdf = pq.read_table(
                os.path.join(docs_root, f"segment={seg}"),
                columns=["doc_id", "url", "lang", "warc_ts", "dl"],
            ).to_pandas()
            sd = SegmentData(pdf, docs_pdf)
            ev = SegmentEvaluator(sd, idf_map, avgdl)
            if flat is not None:
                ids, sc = ev.top_m_pruned(flat[0], flat[1], m)
            else:
                ids, sc = ev.evaluate(ast)
                if len(ids) > m:
                    order = np.lexsort((sd.urls[ids], -sc))[:m]
                    ids, sc = ids[order], sc[order]
            return pd.DataFrame({"url": sd.urls[ids], "score": sc})

        top = (
            post.groupBy("segment")
            .applyInPandas(eval_segment, RESULT_SCHEMA)
            .orderBy(F.col("score").desc(), F.col("url"))
            .limit(m)
            .collect()
        )
        return [(r["url"], r["score"]) for r in top][page * k :]

    def _filter_only(self, ast: P.Node, m: int) -> list[tuple[str, float]]:
        """Queries with no scoring leaves (pure lang:/url:/range filters):
        direct pruned scan of the docs table, score 0, url order."""
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        cond = self._filter_cond(ast)
        if cond is None:
            return []
        rows = docs.filter(cond).orderBy("url").limit(m).select("url").collect()
        return [(r["url"], 0.0) for r in rows]

    def _filter_cond(self, node: P.Node):
        if isinstance(node, P.Term) and node.field in P.FILTER_FIELDS:
            return F.lower(F.col(node.field)) == node.term
        if isinstance(node, P.RangeFilter):
            return (F.col(node.field) >= F.lit(node.lo)) & (
                F.col(node.field) < F.lit(node.hi))
        if isinstance(node, P.And) and node.children:
            conds = [self._filter_cond(c) for c in node.children]
            if any(c is None for c in conds):
                return None
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        return None

    # ---------------- autocomplete ----------------

    def autocomplete(self, prefix: str, n: int = 20) -> list[tuple[str, int]]:
        """Completion over the term dictionary, df-desc
        (reference: hayoo-server/src/Hayoo/App.hs:101-111)."""
        rows = (
            self._terms.filter(F.col("term").startswith(prefix))
            .orderBy(F.col("df").desc(), F.col("term"))
            .limit(n)
            .collect()
        )
        return [(r["term"], r["df"]) for r in rows]
