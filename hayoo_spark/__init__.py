"""hayoo-spark: a PySpark-native full-text indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of hunt-framework/hayoo (the
Hunt-based Haskell API search engine) as an idiomatic Spark pipeline:

- vectorized Arrow/pandas UDF text extraction + tokenization
  (reference: hayooIndexer/src/Hayoo/IndexConfig.hs:62-116);
- document-partitioned index *segments* holding sorted, delta+varbyte
  compressed posting lists with per-block max-score metadata
  (reference analogue: the Hunt context index, observable via
  hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:103-137);
- top-k BM25 query serving with document-at-a-time evaluation and
  block-max WAND pruning, plus the reference's query surface: AND/OR/
  AND-NOT, field scoping, prefix, phrase, range, boosts, paging and
  autocomplete (hayoo-server/src/Hayoo/App.hs:144-200, Examples.md);
- resumable builds with per-partition checkpoint lineage + metrics
  (reference analogue: save intervals, hayooIndexer/src/HayooIndexer.hs:86-88).

Nothing is ported: the reference is consulted only for *semantics*.
"""

__version__ = "0.1.0"
