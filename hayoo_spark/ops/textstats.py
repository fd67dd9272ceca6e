"""Text analysis operators for webtext pipelines.

All hot paths are JVM-side ``pyspark.sql.functions`` expressions (inside
whole-stage codegen); each has an exact DuckDB-SQL twin used by the
driver correctness gate.  Semantics derive from the reference's
analysis chain (tokenizer + boring-word filter,
hayooIndexer/src/Hayoo/IndexConfig.hs:62-116,214-219) generalized to
corpus-quality operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import MIN_TOKEN_LEN, TOKEN_RE, tokens_col

# tiny deterministic stopword lists (language-ID heuristic feature sets)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "den"],
    "es": ["el", "la", "de", "que", "en", "los", "del", "las", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "qui", "une", "sur"],
}


def token_count(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Tokens per doc under the canonical tokenizer (T4-T6 analogue)."""
    return docs.select(
        key, F.size(tokens_col(text)).alias("n_tokens"),
        F.length(F.col(text)).alias("n_chars"),
    )


def quality_score(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic quality features + composite score.

    Features: token count, mean token length, alpha ratio (letter chars /
    non-space chars), English stopword ratio.  Composite is a fixed
    linear blend, returned as x1e4 integer for cross-engine comparison.
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    nonspace = F.length(F.regexp_replace(F.col(text), r"\s+", ""))
    alpha = F.length(F.regexp_replace(F.col(text), r"[^A-Za-z]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    out = docs.select(
        key,
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, tok_chars.cast("double") / n_tokens)
        .otherwise(F.lit(0.0)).alias("mean_tok_len"),
        F.when(nonspace > 0, alpha.cast("double") / nonspace)
        .otherwise(F.lit(0.0)).alias("alpha_ratio"),
        F.when(n_tokens > 0, n_stop.cast("double") / n_tokens)
        .otherwise(F.lit(0.0)).alias("stop_ratio"),
    )
    comp = (
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.col("alpha_ratio") * 0.4
        + F.least(F.col("stop_ratio") * 5.0, F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality_x1e4",
                          F.round(comp * 10000).cast("bigint"))


def lang_id(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic class).

    Counts hits against per-language stopword sets; predicts the argmax
    (ties broken by language code ascending), 'und' if no hits.
    """
    toks = tokens_col(text)

    def _hits(arr):
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    cols = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(w) for w in words])
        cols.append(_hits(arr).alias(f"hits_{lang}"))
    scored = docs.select(key, *cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    # ties broken by language code ascending: build the chain so the
    # lexicographically first language's WHEN is evaluated first
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"hits_{lg}") == best), F.lit(lg)).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


def fingerprint(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """Order-sensitive 56-bit document fingerprint.

    bit_xor over md5-derived hashes of (token, position) pairs — md5 and
    bit_xor exist identically in Spark and DuckDB, so the oracle SQL can
    reproduce it bit-for-bit (unlike xxhash64, which DuckDB lacks).
    """
    toks = docs.select(key, F.posexplode(tokens_col(text)).alias("pos", "term"))
    h = F.conv(F.substring(F.md5(F.concat_ws(":", "term", "pos")), 1, 14), 16, 10) \
        .cast("bigint")
    return (toks.withColumn("h", h)
            .groupBy(key)
            .agg(F.expr("bit_xor(h)").alias("fp"),
                 F.count("*").alias("n_tokens")))


def repetition_signals(docs: DataFrame, key: str = "doc_id",
                       text: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1: duplicate-line and repeated-n-gram filters are the standard
    web-corpus quality gates alongside the heuristics in
    quality_score):

    - ``n_lines`` / ``dup_lines``: non-empty lines and how many are
      exact repeats of an earlier line (all-integer, so the
      cross-engine value-hash is drift-free; callers derive
      dup_line_frac = dup_lines / n_lines);
    - ``top_bigram_n`` / ``n_bigrams``: occurrences of the most
      frequent token 2-gram and total 2-grams (callers derive the
      top-n-gram coverage fraction).

    Plan shape at scale: the line signals are one codegen'd projection
    over the scan (split + array_distinct — no shuffle); the bigram
    mode needs a (key, bigram) count — that is ONE map-side-combinable
    shuffle keyed (key, bigram), a second tiny one keyed (key), and a
    key-equi join back, all standard partial-agg shapes at 100 TB.
    The bigram array is built JVM-side (zip_with over shifted slices),
    not via a window (a lead() window would add a whole-corpus shuffle
    + per-key sort before the count)."""
    col = F.coalesce(F.col(text), F.lit(""))
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    base = docs.select(
        key, n_lines.alias("n_lines"),
        (n_lines - F.size(F.array_distinct(lines))).alias("dup_lines"))
    toks = tokens_col(text)
    bg_arr = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    # group on a 64-bit hash of the bigram, not the string: the count
    # only needs group identity, and 8-byte shuffle keys beat variable-
    # length strings at corpus scale (a collision would need ~2^32
    # bigrams IN ONE DOC to be likely — not a document)
    bg = (docs.select(key, F.explode(bg_arr).alias("bigram"))
          .select(key, F.xxhash64("bigram").alias("bg_h")))
    top = (bg.groupBy(key, "bg_h").agg(F.count("*").alias("c"))
           .groupBy(key).agg(F.max("c").alias("top_bigram_n"),
                             F.sum("c").alias("n_bigrams")))
    return (base.join(top, key, "left").select(
        key, "n_lines", "dup_lines",
        F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams")))


#: fixed published weights for the quality-classifier gate (the
#: fastText/CCNet-style "model-based quality filter" slot, with a
#: deterministic linear model so both engines score bit-identically;
#: a trained model drops into the same feature row).  Feature order is
#: the evaluation order — part of the cross-engine contract.
CLASSIFIER_WEIGHTS = (
    ("f_len", 1.6),        # min(n_tokens / 100, 1)
    ("f_alpha", 2.2),      # letter chars / non-space chars
    ("f_stop", 1.1),       # min(stopword ratio * 5, 1)
    ("f_top_bigram", -2.8),  # most-frequent-bigram coverage
    ("f_dup_line", -1.9),  # duplicate-line fraction
)
CLASSIFIER_BIAS = -1.3


def quality_classifier(docs: DataFrame, key: str = "doc_id",
                       text: str = "text") -> DataFrame:
    """Linear quality classifier over the engineered feature row —
    the decision gate composing the heuristic features
    (``quality_score``) with the Gopher repetition signals
    (``repetition_signals``) into one logit + keep label.

    logit = bias + Σ w_i · f_i  in the fixed ``CLASSIFIER_WEIGHTS``
    order (left-to-right — IEEE addition is order-sensitive, and the
    DuckDB twin evaluates identically); ``keep = logit >= 0``.  The
    logit ships quantized (x1e4 bigint) so the cross-engine value hash
    is drift-free.

    Plan shape at scale: ALL scalar features (length, alpha, stopword,
    line signals) ride one fused projection over one scan; the only
    shuffle is the (key, bigram) count — the same partial-agg shape
    repetition_signals has alone — joined back once.  (The previous
    composition of quality_score ⋈ repetition_signals scanned the
    corpus three times and joined twice; the expressions below are the
    same ones those helpers evaluate, so values are bit-identical.)
    """
    # NULL text scores as '' — otherwise size(NULL) feeds NULL into
    # least(), which IGNORES NULLs and silently pins f_len to 1.0
    docs = docs.withColumn(text, F.coalesce(F.col(text), F.lit("")))
    col = F.coalesce(F.col(text), F.lit(""))
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    nonspace = F.length(F.regexp_replace(F.col(text), r"\s+", ""))
    alpha = F.length(F.regexp_replace(F.col(text), r"[^A-Za-z]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    alpha_ratio = F.when(nonspace > 0, alpha.cast("double") / nonspace) \
        .otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens) \
        .otherwise(F.lit(0.0))
    lines = F.filter(F.split(col, "\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    base = docs.select(
        key, n_tokens.alias("n_tokens"), alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"), n_lines.alias("n_lines"),
        dup_lines.alias("dup_lines"))
    bg_arr = F.zip_with(
        F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    bg = (docs.select(key, F.explode(bg_arr).alias("bigram"))
          .select(key, F.xxhash64("bigram").alias("bg_h")))
    top = (bg.groupBy(key, "bg_h").agg(F.count("*").alias("c"))
           .groupBy(key).agg(F.max("c").alias("top_bigram_n"),
                             F.sum("c").alias("n_bigrams")))
    feats = base.join(top, key, "left").select(
        key,
        F.least(F.col("n_tokens").cast("double") / 100.0, F.lit(1.0))
        .alias("f_len"),
        F.col("alpha_ratio").alias("f_alpha"),
        F.least(F.col("stop_ratio") * 5.0, F.lit(1.0)).alias("f_stop"),
        F.when(F.coalesce("n_bigrams", F.lit(0)) > 0,
               F.coalesce("top_bigram_n", F.lit(0)).cast("double")
               / F.coalesce("n_bigrams", F.lit(0)))
        .otherwise(F.lit(0.0)).alias("f_top_bigram"),
        F.when(F.col("n_lines") > 0,
               F.col("dup_lines").cast("double") / F.col("n_lines"))
        .otherwise(F.lit(0.0)).alias("f_dup_line"),
    )
    logit = F.lit(float(CLASSIFIER_BIAS))
    for name, w in CLASSIFIER_WEIGHTS:
        logit = logit + F.lit(float(w)) * F.col(name)
    return feats.select(
        key,
        F.round(logit * 10000).cast("bigint").alias("logit_x1e4"),
        F.when(logit >= 0, F.lit(1)).otherwise(F.lit(0)).alias("keep"))


def duckdb_tokens_cte(table: str, key: str, text_col: str) -> str:
    """(key, term, pos) with positions assigned AFTER the min-length
    filter, matching tokens_col + posexplode exactly.  Uses paired
    unnest + generate_subscripts (DuckDB lacks WITH ORDINALITY)."""
    return (
        f"SELECT {key}, unnest(f) AS term, "
        f"CAST(generate_subscripts(f, 1) - 1 AS BIGINT) AS pos FROM ("
        f"SELECT {key}, list_filter(regexp_extract_all(lower({text_col}), "
        f"'{TOKEN_RE}'), x -> length(x) >= {MIN_TOKEN_LEN}) AS f FROM {table})"
    )


#: PII patterns applied IN ORDER (earlier replacements cannot create
#: later matches); conservative dialect-portable regexes — the same
#: strings run under Java regex (Spark) and RE2 (the DuckDB oracle)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("phone", r"\+[0-9]{7,15}", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "[IP]"),
)


def scrub_pii(docs: DataFrame, key: str = "doc_id",
              text: str = "text") -> DataFrame:
    """PII redaction for training corpora (the C4/Dolma-style scrub):
    emails, international phone numbers and IPv4 literals are replaced
    with typed placeholders, with a per-doc redaction count.

    Pure JVM regexp expressions — one codegen'd projection over the
    scan, no UDF, no shuffle; counts are taken against the progressive
    text state so a replaced span is never double-counted.  NULL text
    scrubs to '' with n_pii = 0 (NULL-propagating size() would
    otherwise poison downstream aggregations over n_pii)."""
    col = F.coalesce(F.col(text), F.lit(""))
    n = F.lit(0).cast("long")
    for _, pat, repl in PII_PATTERNS:
        n = n + F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        col = F.regexp_replace(col, pat, repl)
    return docs.select(F.col(key), col.alias("text_scrubbed"),
                       n.alias("n_pii"))


def clean_corpus(docs: DataFrame, key: str = "doc_id",
                 text: str = "text",
                 min_quality_x1e4: int = 5000,
                 langs: tuple[str, ...] = ("en",),
                 dedup_pairs: DataFrame | None = None) -> DataFrame:
    """The composed training-data cleaning pass (the C4/RefinedWeb
    recipe shape): quality threshold AND language allowlist AND
    near-duplicate removal, as one declarative plan —

    - quality: composite heuristic score >= ``min_quality_x1e4``;
    - language: stopword-profile prediction in ``langs``;
    - dedup: given near-dup PAIRS (any generator in ops/dedup), keep
      only each connected component's keeper (min id), via
      dedup.dedup_clusters + a left-anti join on the non-keepers.

    Returns the surviving docs with (quality_x1e4, pred_lang) attached
    — Catalyst fuses the two stopword/token passes over one scan; the
    only shuffles are the component propagation (bounded by component
    diameter) and the final anti-join on the non-keeper set.  That
    anti-join is a plain shuffle join on purpose: real web corpora
    shed 30-50% of docs to near-dup removal, so the drop set is
    O(corpus) — broadcasting it would OOM the driver at scale.  AQE
    still downgrades it to a broadcast at runtime when the measured
    size is small, which is the right call in both directions.
    """
    # quality and language are ROW-LOCAL projections of the same scan —
    # attach them as columns instead of computing two derived frames
    # and joining each back on key (three scans + two joins -> one
    # scan, zero joins; same expressions, so values are identical)
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    nonspace = F.length(F.regexp_replace(F.col(text), r"\s+", ""))
    alpha = F.length(F.regexp_replace(F.col(text), r"[^A-Za-z]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    alpha_ratio = F.when(nonspace > 0, alpha.cast("double") / nonspace) \
        .otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens) \
        .otherwise(F.lit(0.0))
    comp = (
        F.least(n_tokens.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )
    hits = {lg: F.size(F.filter(
        toks, lambda t: F.array_contains(
            F.array([F.lit(w) for w in words]), t)))
        for lg, words in sorted(STOPWORDS.items())}
    lgs = sorted(STOPWORDS)
    best = F.greatest(*[hits[lg] for lg in lgs])
    pred = F.lit("und")
    for lg in reversed(lgs):
        pred = F.when((best > 0) & (hits[lg] == best), F.lit(lg)) \
            .otherwise(pred)
    out = (docs
           .withColumn("quality_x1e4",
                       F.round(comp * 10000).cast("bigint"))
           .withColumn("pred_lang", pred)
           .filter(F.col("quality_x1e4") >= min_quality_x1e4)
           .filter(F.col("pred_lang").isin(list(langs))))
    if dedup_pairs is not None:
        from .dedup import dedup_clusters
        drop = (dedup_clusters(dedup_pairs)
                .filter(F.col("is_keeper") == 0)
                .select(F.col("doc_id").alias(key)))
        out = out.join(drop, key, "left_anti")
    return out


def tfidf_keywords(docs: DataFrame, k: int = 5, key: str = "doc_id",
                   text: str = "text") -> DataFrame:
    """Per-document top-k keywords by tf-idf (document fingerprinting /
    tagging for corpus exploration).

    The idf factor is the integer surrogate ``(1e6 * N) DIV df`` —
    exact integer arithmetic on both engines (a float ``ln`` would be
    libm-dependent and flip rank ties cross-engine; the integer
    reciprocal-df is order-equivalent to idf for ranking within a
    corpus).  score = tf * idf_q; rank ties break on term asc.

    Scale shape: tf is one map-side-combinable groupBy; df is a second
    over ~|vocab| rows, broadcast back onto tf (the 100 TB side never
    re-shuffles); the per-doc top-k window partitions by doc — millions
    of tiny partitions, no skew (a doc has bounded distinct terms).
    """
    from pyspark.sql import Window
    toks = docs.select(key, F.explode(tokens_col(text)).alias("term"))
    tf = toks.groupBy(key, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    scored = (tf.join(F.broadcast(dfr), "term")
              .withColumn("score_q",
                          F.col("tf") * F.expr(
                              f"CAST({n_docs} AS BIGINT) * 1000000 DIV df")))
    w = Window.partitionBy(key).orderBy(F.col("score_q").desc(), "term")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(key, "rank", "term", "tf",
                    F.col("score_q").cast("bigint").alias("score_q")))
