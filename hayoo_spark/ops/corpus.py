"""Corpus-assembly operators for training-data pipelines.

The three steps a pretraining pipeline runs after cleaning/dedup:

- ``stratified_sample``: deterministic per-stratum downsampling (the
  domain-mixture lever — "keep 30% of crawl, 100% of reference text");
- ``hash_split``: deterministic train/val/test assignment by hashed
  key ranges (reproducible across re-runs AND cluster sizes — no
  ``rand()``, whose per-partition seeding changes with parallelism);
- ``pack_sequences``: GPT-style sequence-packing assignment — docs are
  concatenated in deterministic key order within a shard and cut every
  ``budget`` tokens; each doc learns which training sequence (bin) its
  first token lands in and at what offset.

All three are pure whole-stage-codegen column expressions (zero
Python, zero extra shuffles beyond ``pack_sequences``' per-shard sort)
with exact DuckDB-SQL twins for the driver gate.  Determinism contract:
the sample/split decision for a row depends ONLY on (key, salt) — so
adding or removing other rows never flips it (stable under incremental
corpus growth, unlike reservoir/fraction sampling).

Reference analogue: the reference engine has no sampling tier (its
corpus is the full Hackage set, hayooIndexer crawls everything,
reference Makefile:17-25); these generalize its deterministic
URI-first-wins selection (newHayooIndexer/src/MainHoogle.hs:124-133)
to rate-controlled selection at web scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..analysis import tokens_col

#: 2^56 — the md5-derived hash below is 14 hex digits = 56 bits, so
#: ``h / HASH_SPACE`` is uniform in [0, 1) and identical in DuckDB via
#: ('0x' || substr(md5(x), 1, 14))::BIGINT / 72057594037927936.0
HASH_SPACE = float(1 << 56)


def _u01(key: Column, salt: str) -> Column:
    """Deterministic uniform-[0,1) draw from (key, salt) — md5-derived
    so the DuckDB oracle reproduces it bit-exactly (xxhash64 would be
    faster JVM-side but has no DuckDB twin; sampling runs once per
    corpus assembly, so portability wins)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", key.cast("string"),
                                      F.lit(salt))), 1, 14),
        16, 10).cast("bigint")
    return h / F.lit(HASH_SPACE)


def u01_sql(key_expr: str, salt: str) -> str:
    """The DuckDB twin of ``_u01`` (exposed for oracle builders)."""
    return (f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || "
            f"chr(31) || '{salt}'), 1, 14))::BIGINT / {HASH_SPACE!r})")


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      stratum: str = "lang", key: str = "doc_id",
                      salt: str = "sample",
                      default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff its deterministic draw < its stratum's rate.

    ``rates`` maps stratum values to keep-probabilities; strata not
    listed keep ``default_rate``.  No shuffle, no Python: one codegen'd
    filter over the scan — at 100 TB this is a map-only pass whose
    output size is exactly Σ rate_s · |s| in expectation, and the SAME
    rows survive regardless of partitioning or executor count.
    """
    rate = F.lit(float(default_rate))
    for val, r in sorted(rates.items()):
        rate = F.when(F.col(stratum) == val, F.lit(float(r))).otherwise(rate)
    return docs.filter(_u01(F.col(key), salt) < rate)


def hash_split(docs: DataFrame, splits: dict[str, float],
               key: str = "doc_id", salt: str = "split") -> DataFrame:
    """Assign every row a split label by cumulative hash ranges.

    ``splits`` maps label -> fraction (must sum to <= 1; any residual
    mass falls in the LAST label, so {"train": .9, "val": .05,
    "test": .05} is exact).  Labels are assigned in sorted-label order
    for determinism.  Adds a ``split`` column; no rows are dropped.
    """
    u = _u01(F.col(key), salt)
    labels = sorted(splits)
    expr = F.lit(labels[-1])
    acc = 0.0
    cuts = []
    for lab in labels[:-1]:
        acc += float(splits[lab])
        cuts.append((lab, acc))
    for lab, cut in reversed(cuts):
        expr = F.when(u < cut, F.lit(lab)).otherwise(expr)
    return docs.withColumn("split", expr)


def domain_mixture(docs: DataFrame, targets: dict[str, float],
                   domain: str = "source", key: str = "doc_id",
                   salt: str = "mixture") -> DataFrame:
    """Exact-proportion domain-mixture resampling.

    ``stratified_sample`` takes per-stratum KEEP RATES as given; this
    op takes the TARGET MIXTURE (domain -> share of the output corpus,
    e.g. the DoReMi/Pile-style domain weights) and derives the rates
    from the data: with n_d rows per domain, the largest corpus
    reachable by pure downsampling is  scale = min_d n_d / target_d,
    and each domain keeps  rate_d = scale * target_d / n_d  (exactly 1
    for the binding domain, <1 elsewhere), decided per row by the same
    deterministic (key, salt) draw.  Domains not listed are dropped;
    expected output composition is exactly ``targets``.

    Plan shape at scale: ONE map-side-combined count per domain (a
    handful of rows), a scalar min, then a broadcast join of the tiny
    rate table back onto the scan — the corpus itself never shuffles.
    The same rows survive at any parallelism, and incremental corpus
    growth only moves rates, never re-flips old rows' draws except
    through the rate boundary.
    """
    if not targets or any(t <= 0 for t in targets.values()):
        raise ValueError("targets must be non-empty with positive shares")
    # sorted-order CASE chain; the 0.0 default never survives the
    # domain filter below
    tgt = F.lit(0.0)
    for val, t in sorted(targets.items()):
        tgt = F.when(F.col(domain) == val, F.lit(float(t))).otherwise(tgt)

    kept = docs.filter(F.col(domain).isin(sorted(targets)))
    cnt = (kept.groupBy(domain).agg(F.count("*").alias("n"))
           .withColumn("target", tgt))
    scale = cnt.agg(F.min(F.col("n") / F.col("target")).alias("scale"))
    rates = (cnt.crossJoin(F.broadcast(scale))
             .select(domain,
                     ((F.col("scale") * F.col("target")) / F.col("n"))
                     .alias("rate")))
    return (kept.join(F.broadcast(rates), domain)
            .filter(_u01(F.col(key), salt) < F.col("rate"))
            .drop("rate"))


def domain_mixture_sql(table: str, targets: dict[str, float],
                       domain: str = "source", key: str = "doc_id",
                       salt: str = "mixture",
                       cols: str = "doc_id, source") -> str:
    """DuckDB twin of ``domain_mixture`` — identical float evaluation
    order (n / target, min, (scale * target) / n) so the kept set is
    bit-identical."""
    doms = ", ".join(f"'{d}'" for d in sorted(targets))
    case = " ".join(f"WHEN '{d}' THEN {float(t)!r}"
                    for d, t in sorted(targets.items()))
    return f"""
WITH d AS (SELECT * FROM {table} WHERE {domain} IN ({doms})),
cnt AS (SELECT {domain}, count(*) AS n,
               CASE {domain} {case} END AS target
        FROM d GROUP BY {domain}),
s AS (SELECT min(n / target) AS scale FROM cnt),
r AS (SELECT {domain}, (scale * target) / n AS rate
      FROM cnt CROSS JOIN s)
SELECT {cols} FROM d JOIN r USING ({domain})
WHERE {u01_sql(key, salt)} < rate"""


def pack_sequences(docs: DataFrame, budget: int, shard: str,
                   key: str = "doc_id", text: str = "text") -> DataFrame:
    """Sequence-packing assignment: concatenate docs in ``key`` order
    within each ``shard`` and cut every ``budget`` tokens.

    Returns (key, shard, n_tokens, bin_id, bin_offset): ``bin_id`` is
    the training sequence whose window contains the doc's FIRST token,
    ``bin_offset`` that token's position within it — exactly the
    pretraining concat-then-slice layout, so a doc may straddle bins
    (its tail flows into bin_id+1...), and no capacity is wasted.

    Scale shape: the only wide operation is one window cumsum
    partitioned by ``shard`` — docs within a shard sort locally; there
    is never a global total order (the classic single-reducer trap).
    Shards are independent, so 100 TB packs as N_shards parallel
    sorts of |shard| docs each.  ``shard`` is required for exactly
    this reason — passing a constant would serialize the corpus.
    """
    # NULL text counts 0 tokens — F.size(tokenize(NULL)) is NULL, which
    # would NULL the window cumsum downstream and silently drop the doc
    # from token-accounting sums (same failure scrub_pii coalesces for)
    n_toks = F.coalesce(F.size(tokens_col(text)), F.lit(0))
    w = (Window.partitionBy(shard).orderBy(key)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (docs
            .select(key, shard, n_toks.alias("n_tokens"))
            .select(key, shard, "n_tokens",
                    F.floor(start / budget).alias("bin_id"),
                    (start % budget).alias("bin_offset")))


def chunk_documents(docs: DataFrame, size: int = 128, stride: int = 96,
                    key: str = "doc_id", text: str = "text") -> DataFrame:
    """Overlapping token-window chunking (the RAG / long-context
    training prep step): each doc's token stream is cut into windows of
    ``size`` tokens starting every ``stride`` (overlap = size−stride).

    Returns (key, chunk_id, start, n_tokens, first_term, last_term) —
    the chunk ASSIGNMENT relation; materializing chunk text is a
    downstream projection (``slice(tk, start+1, size)``) kept out of
    the contract so the output stays narrow.

    Scale shape: pure codegen — tokenize, one ``sequence``/``explode``
    fan-out per doc, arithmetic; no shuffle at all (chunk rows inherit
    the doc's partition), so 100 TB chunks at scan speed.  Zero-token
    docs produce zero chunks by contract.

    Reference analogue: the reference splits pages into per-declaration
    virtual docs at anchor boundaries (split.py T1, Split.hs); this is
    the fixed-window counterpart a token-budgeted trainer needs.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    d = (docs.select(key, tokens_col(text).alias("tk"))
         .withColumn("n", F.size("tk"))
         .filter(F.col("n") > 0))
    d = d.select(key, "tk", "n",
                 F.explode(F.sequence(F.lit(0), F.col("n") - 1,
                                      F.lit(stride))).alias("start"))
    n_tok = F.least(F.lit(size), F.col("n") - F.col("start"))
    return d.select(
        key,
        (F.col("start") / stride).cast("bigint").alias("chunk_id"),
        F.col("start").cast("bigint"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.element_at("tk", F.col("start") + 1).alias("first_term"),
        F.element_at("tk", F.col("start") + n_tok).alias("last_term"))
