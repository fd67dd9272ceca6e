"""BPE tokenizer-vocabulary training over a Spark corpus.

Training a subword vocabulary is the step between corpus assembly and
model training.  The standard distributed shape (sentencepiece / HF
tokenizers train the same way) is:

1. ONE Spark pass builds the word histogram — ``(word, count)`` — the
   only job that touches the corpus.  The histogram is bounded (distinct
   token types, not tokens); ``max_words`` prunes it to the head by
   (count desc, word asc) so the driver-side state is capped even when
   the long tail of typos/numbers is huge at web scale.
2. The merge loop runs driver-side over the collected histogram with
   incremental pair-count maintenance — O(affected words) per merge,
   never a corpus rescan.  Spark is the wrong tool for a loop whose
   state is a few MB and whose iteration count is the vocab size.
3. ``apply_bpe`` encodes the corpus with the learned merge ranks via an
   Arrow-batched ``mapInPandas`` kernel (per-word LRU memoisation inside
   each batch — Zipf makes the hit rate ~1), the documented slow-path
   escape hatch for logic Catalyst can't express.

``bpe_pair_counts`` (step 1.5 — the first merge iteration's weighted
symbol-pair counts) is pure whole-stage-codegen SQL and carries the
driver-gate DuckDB twin; the iterative loop itself is covered by pytest
against an independent brute-force reference.

Reference analogue: the reference tokenizes with fixed per-context
regexes (hayooIndexer/src/Hayoo/IndexConfig.hs:62-116); a learned
subword vocabulary is the webtext generalization of that fixed rule.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis import tokenize_series, tokens_col

#: marks word end so merges cannot cross word boundaries (Sennrich
#: et al. 2016 formulation).
END = "</w>"


def word_histogram(docs: DataFrame, text: str = "text",
                   max_words: int | None = None) -> DataFrame:
    """(word, wc) under the canonical tokenizer — one shuffle, map-side
    combined.  ``max_words`` keeps the top of the Zipf curve by
    (wc desc, word asc); the dropped tail is the low-count mass BPE
    merges would never select anyway."""
    hist = (docs.select(F.explode(tokens_col(text)).alias("word"))
            .groupBy("word").agg(F.count("*").alias("wc")))
    if max_words is not None:
        # orderBy().limit() = distributed TakeOrderedAndProject (per-
        # partition heads merged on the driver), not a one-reducer
        # row_number window
        hist = hist.orderBy(F.desc("wc"), F.asc("word")).limit(max_words)
    return hist


def bpe_pair_counts(hist: DataFrame, top: int | None = None) -> DataFrame:
    """Weighted adjacent character-pair counts over the word histogram —
    exactly the statistic the FIRST BPE merge maximizes (the word-end
    marker pair included).  Pure codegen: sequence + explode + one
    aggregation of the (bounded) histogram, the corpus is not touched.

    Returns (p1, p2, cnt) ordered/limited deterministically by
    (cnt desc, p1 asc, p2 asc) when ``top`` is given.
    """
    sym = hist.select("wc", "word", F.length("word").alias("n"))
    # position i in 1..n pairs (char_i, char_{i+1}); i == n pairs the
    # final character with the END marker as ONE symbol.  sequence is
    # ascending-safe: n >= MIN_TOKEN_LEN >= 1 after tokenize.
    pairs = sym.select(
        "wc", F.col("word").alias("w"),
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"),
        F.col("n"))
    p1 = F.substring(F.col("w"), F.col("i"), 1)
    # the last position pairs the final character with the END marker
    # as ONE symbol (not its individual chars)
    p2 = F.when(F.col("i") < F.col("n"),
                F.substring(F.col("w"), F.col("i") + 1, 1)) \
        .otherwise(F.lit(END))
    out = (pairs.select(p1.alias("p1"), p2.alias("p2"), "wc")
           .groupBy("p1", "p2").agg(F.sum("wc").alias("cnt")))
    if top is not None:
        out = out.orderBy(F.desc("cnt"), F.asc("p1"), F.asc("p2")) \
            .limit(top)
    return out


def duckdb_pair_counts_sql(hist_cte: str, top: int | None = None) -> str:
    """DuckDB twin of bpe_pair_counts over a (word, wc) CTE body."""
    lim = f"ORDER BY cnt DESC, p1, p2 LIMIT {top}" if top else ""
    return f"""
WITH hist AS ({hist_cte}),
pos AS (SELECT wc, word, unnest(generate_series(1, length(word))) AS i,
               length(word) AS n
        FROM hist)
SELECT substr(word, i, 1) AS p1,
       CASE WHEN i < n THEN substr(word, i + 1, 1) ELSE '{END}' END AS p2,
       CAST(sum(wc) AS BIGINT) AS cnt
FROM pos GROUP BY 1, 2 {lim}"""


def train_bpe(hist: DataFrame | list[tuple[str, int]],
              n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word histogram.

    Deterministic: the merge chosen each round is the max by
    (count, pair) with ties broken by lexicographically SMALLEST pair —
    reproducible regardless of dict iteration order or partitioning.
    Incremental maintenance: a merge only revisits the words that
    contain its pair (tracked via an inverted pair->word index), so a
    full pass over the histogram happens once, not per merge.
    """
    if isinstance(hist, DataFrame):
        rows = [(r["word"], int(r["wc"])) for r in hist.collect()]
    else:
        rows = [(w, int(c)) for w, c in hist]
    words: list[list[str]] = [list(w) + [END] for w, _ in rows]
    counts = [c for _, c in rows]

    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(words):
        c = counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_n[(a, b)] += c
            where[(a, b)].add(wi)

    def merge_word(wi: int, pair: tuple[str, str], joined: str) -> None:
        syms = words[wi]
        c = counts[wi]
        # retract the word's current pair contributions, rewrite, re-add
        for a, b in zip(syms, syms[1:]):
            pair_n[(a, b)] -= c
            if pair_n[(a, b)] <= 0:
                pair_n.pop((a, b), None)
            s = where.get((a, b))
            if s is not None:
                s.discard(wi)
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(joined)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        words[wi] = out
        for a, b in zip(out, out[1:]):
            pair_n[(a, b)] += c
            where[(a, b)].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_n:
            break
        # tie rule: among equal counts take the lexicographically
        # smallest pair — deterministic under any dict iteration order
        top_n = max(pair_n.values())
        pair = min(p for p, n in pair_n.items() if n == top_n)
        merges.append(pair)
        joined = pair[0] + pair[1]
        for wi in sorted(where.get(pair, ())):
            merge_word(wi, pair, joined)
        pair_n.pop(pair, None)
        where.pop(pair, None)
    return merges


def encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with learned merge ranks (HF/GPT-2 algorithm:
    repeatedly apply the lowest-ranked present pair)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = rank.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]],
              key: str = "doc_id", text: str = "text") -> DataFrame:
    """Encode the corpus: (key, n_tokens, n_pieces, pieces_per_token).

    Arrow-batched mapInPandas; the merge table rides the closure (it is
    vocab-sized — KBs to a few MB — the same envelope Spark broadcasts
    for any UDF).  Per-word memoisation makes the per-batch cost
    ~O(distinct words), which Zipf keeps near the vocab size.
    """
    rank = {p: i for i, p in enumerate(merges)}
    out_schema = f"{key} long, n_tokens long, n_pieces long, " \
                 "pieces_per_token double"

    def enc(batches):
        cache: dict[str, int] = {}

        def pieces_of(w: str) -> int:
            n = cache.get(w)
            if n is None:
                n = len(encode_word(w, rank))
                cache[w] = n
            return n

        for pdf in batches:
            toks = tokenize_series(pdf[text].fillna(""))
            n_tok = toks.map(len)
            n_pcs = toks.map(lambda ts: sum(pieces_of(w) for w in ts))
            yield pd.DataFrame({
                key: pdf[key],
                "n_tokens": n_tok.astype("int64"),
                "n_pieces": n_pcs.astype("int64"),
                "pieces_per_token": [
                    (p / t) if t else 0.0
                    for p, t in zip(n_pcs, n_tok)],
            })

    return docs.select(key, text).mapInPandas(enc, schema=out_schema)
