"""Statistical language-model operators: bigram LM training + per-doc
perplexity scoring (the CCNet-style quality signal).

A pretraining pipeline's canonical model-based filter scores every
document's cross-entropy under a small n-gram LM and drops the tail
(CCNet buckets crawl text by Wikipedia-LM perplexity).  This module is
the Spark-first version of that signal:

- ``bigram_lm``: ONE tokenize pass over the training corpus -> unigram
  and bigram count relations (two shuffles, both map-side combined by
  Spark's partial aggregation).  ``vocab_top``/``bigram_top`` prune the
  count tables to the head by (count desc, key asc) — at web scale the
  pruned LM is a few hundred MB and is BROADCAST to the scoring join,
  so the 100 TB side never shuffles.  Pruned-away entries score as
  smoothed zeros (left join + coalesce), which is exactly the add-one
  backoff the scorer applies to genuinely unseen pairs.
- ``lm_perplexity``: per-document bits-per-token under the interpolated
  add-one bigram model  p(w2|w1) = (c12 + 1) / (c1 + V).

Cross-engine exactness contract (the driver's oracle gate hash-compares
values): every count is an exact integer; the only libm call (log2 of
an exact integer ratio) is quantized to integer CENTIBITS per bigram
*before* the per-doc sum, so float accumulation order can never change
the result; ``bits_per_token`` is one final IEEE division of exact
integers.  This is the same discipline as textstats.quality_score
(x1e4 integers) and dedup's 56-bit hashes.

Reference analogue: the reference has no model-based filter (its corpus
is curated Hackage docs); this generalizes its boring-word frequency
filter (hayooIndexer/src/Hayoo/IndexConfig.hs:214-219 — a hand-rolled
unigram stoplist) to a learned frequency model.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokens_col

#: bigram pairs as an array of (w1, w2) structs — a single projection
#: over the token array (no positional self-join / no extra shuffle).
#: Guarded for <2-token docs because slice() rejects negative lengths.
_PAIRS_EXPR = (
    "CASE WHEN size(ts) < 2 THEN array() "
    "ELSE transform(slice(ts, 1, size(ts) - 1), "
    "(w, i) -> named_struct('w1', w, 'w2', ts[i + 1])) END"
)


@dataclass
class BigramLm:
    """Count relations + smoothing constants for an add-one bigram LM."""
    unigrams: DataFrame   # (term, c1)
    bigrams: DataFrame    # (w1, w2, c12)
    vocab_size: int       # V BEFORE pruning (the smoothing denominator)


def _tok_rel(docs: DataFrame, key: str, text: str) -> DataFrame:
    """(key, ts array<string>) — the shared tokenization."""
    return docs.select(key, tokens_col(text).alias("ts"))


def _pairs(docs: DataFrame | None, key: str, text: str,
           ts: DataFrame | None = None) -> DataFrame:
    """(key, w1, w2) — one row per bigram position.  ``ts``: an
    already-tokenized (optionally persisted) relation, so self-trained
    scoring does not re-run the corpus regex per consumer."""
    if ts is None:
        ts = _tok_rel(docs, key, text)
    pair = ts.select(key, F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
    return pair.select(key, F.col("p.w1").alias("w1"),
                       F.col("p.w2").alias("w2"))


def bigram_lm(train: DataFrame, key: str = "doc_id", text: str = "text",
              vocab_top: int | None = None,
              bigram_top: int | None = None,
              ts: DataFrame | None = None) -> BigramLm:
    """Train the count model.  Pruning keeps the top-N rows by
    (count desc, key asc) via orderBy().limit() — a distributed
    TakeOrderedAndProject (per-partition heads merged on the driver),
    never a single-reducer row_number window — and the total order
    makes the model reproducible across partitionings and cluster
    sizes.  Both count relations are persisted: they are read again by
    the scoring join (and ``uni`` by the vocab_size action), and
    without the persist each reuse would re-tokenize the corpus.
    ``ts``: optional shared token relation (see _pairs)."""
    if ts is None:
        ts = _tok_rel(train, key, text)
    uni = (ts.select(F.explode("ts").alias("term"))
           .groupBy("term").agg(F.count("*").alias("c1"))).persist()
    # V is the smoothing denominator and must not move when the count
    # table is pruned (otherwise pruning changes every probability).
    # One bounded action: |vocab| is the distinct-token count.
    vocab_size = uni.count()
    if vocab_top is not None:
        uni = uni.orderBy(F.desc("c1"), F.asc("term")).limit(vocab_top)
    bi = (_pairs(None, key, text, ts=ts)
          .groupBy("w1", "w2").agg(F.count("*").alias("c12")))
    if bigram_top is not None:
        bi = bi.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2")) \
            .limit(bigram_top)
    return BigramLm(unigrams=uni, bigrams=bi.persist(),
                    vocab_size=vocab_size)


def lm_perplexity(docs: DataFrame, key: str = "doc_id",
                  text: str = "text", model: BigramLm | None = None,
                  broadcast_lm: bool = False) -> DataFrame:
    """Per-doc cross-entropy under ``model`` (default: self-trained).

    Returns (key, n_bigrams, sum_centibits, bits_per_token):

    - ``sum_centibits`` = Σ floor(100·log2((c1+V)/(c12+1))) over the
      doc's bigram positions — integer, so exact under any partial-agg
      order;
    - ``bits_per_token`` = sum_centibits / (100·n_bigrams) — a single
      IEEE division (0.0 for docs with fewer than 2 tokens).

    ``broadcast_lm=True`` broadcast-hints both count relations; use it
    with a pruned model (vocab_top/bigram_top) so the scored corpus —
    the 100 TB side — is never shuffled for the lookup joins.
    """
    ts = None
    if model is None:
        # self-trained: ONE persisted tokenization feeds the unigram
        # counts, the bigram counts AND the scoring pass (three corpus
        # regex passes otherwise)
        ts = _tok_rel(docs, key, text).persist()
        model = bigram_lm(docs, key, text, ts=ts)
    uni, bi = model.unigrams, model.bigrams
    if broadcast_lm:
        uni, bi = F.broadcast(uni), F.broadcast(bi)
    bgr = _pairs(docs, key, text, ts=ts)
    joined = (bgr.join(bi, on=["w1", "w2"], how="left")
              .join(uni.withColumnRenamed("term", "w1"), on="w1",
                    how="left"))
    ratio = ((F.coalesce("c1", F.lit(0)) + F.lit(model.vocab_size))
             .cast("double")
             / (F.coalesce("c12", F.lit(0)) + F.lit(1)))
    cb = F.floor(F.lit(100) * F.log2(ratio)).cast("long")
    agg = (joined.select(key, cb.alias("cb"))
           .groupBy(key).agg(F.count("*").alias("n_bigrams"),
                             F.sum("cb").alias("sum_centibits")))
    n = F.coalesce("n_bigrams", F.lit(0))
    s = F.coalesce("sum_centibits", F.lit(0))
    return (docs.select(key).join(agg, on=key, how="left")
            .select(
                key,
                n.alias("n_bigrams"),
                s.alias("sum_centibits"),
                F.when(n > 0, s.cast("double") / (F.lit(100) * n))
                .otherwise(F.lit(0.0)).alias("bits_per_token")))
