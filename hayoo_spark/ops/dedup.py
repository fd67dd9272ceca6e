"""Deduplication operators for web-scale corpora.

Five families, each expressed Spark-first:

- exact: hash-groupBy on content digest (the A6/A7 analogue —
  reference dedups re-exports by Murmur64 content hash, hayooIndexer/
  src/Hayoo/Hunt/FctIndexerCore.hs:276-295, and by first-wins URI,
  newHayooIndexer/src/MainHoogle.hs:124-133);
- n-gram Jaccard (exact): shingle explode -> self-join on shingle ->
  |A∩B| / (|A|+|B|-|A∩B|) — quadratic only within shared-shingle
  groups, the classic exact-verify step;
- MinHash + LSH: shingle -> k permuted min-hashes -> band buckets ->
  candidate pairs from bucket joins -> exact-Jaccard verify.  The scale
  path: candidate generation is linear in corpus size; only candidates
  pay the verify join;
- SimHash: 64-bit weighted-projection signature per doc via a grouped
  Arrow UDF (numpy bit ops), near-dup = small Hamming distance;
- embedding cosine: exact pairwise above threshold (verify path for an
  ANN front like ops/similarity.lsh_buckets).

Hashes that must match a DuckDB oracle use md5-derived integers
(identical on both engines); Spark-only paths use xxhash64 (faster,
JVM-side).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..analysis import tokens_col

log = logging.getLogger(__name__)

# md5-derived 56-bit integer hash — computable identically in DuckDB:
#   CAST(CONV(substr(md5(x),1,14),16,10) AS BIGINT)  (Spark)
#   ('0x' || substr(md5(x),1,14))::BIGINT            (DuckDB, if supported)
def _md5i(col):
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("bigint")


def shingles(docs: DataFrame, key: str = "doc_id", text: str = "text",
             n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: (key, shingle string).

    The token array is materialized as a column BEFORE the window
    transform: a lambda body referencing the tokenizer EXPRESSION
    re-runs regexp_extract_all once per array element (one full-text
    regex pass per shingle — ~n_tokens x the intended cost, visible as
    the repeated regex in the Generate node of the plan).  Referencing
    a materialized column keeps tokenization at once per document;
    CollapseProject leaves it alone because the alias is consumed more
    than once by non-cheap expressions."""
    d = docs.select(key, tokens_col(text).alias("tk"))
    tk = F.col("tk")
    sh = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - n),
            lambda i: F.concat_ws(" ", F.slice(tk, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", tk)))
    return d.select(key, F.explode(F.array_distinct(sh)).alias("shingle")) \
        .filter(F.length("shingle") > 0)


def exact_duplicates(docs: DataFrame, key: str = "doc_id",
                     text: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (digest, n, keeper, members)."""
    return (
        docs.select(F.md5(F.col(text)).alias("digest"), F.col(key))
        .groupBy("digest")
        .agg(F.count("*").alias("n"),
             F.min(key).alias("keeper"),
             F.sort_array(F.collect_list(key)).alias("members"))
        .filter(F.col("n") > 1)
    )


def ngram_jaccard_pairs(docs: DataFrame, key: str = "doc_id",
                        text: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        sh: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (a < b, jaccard >= threshold).

    Self-join on shingle is the standard exact formulation; at corpus
    scale you front it with MinHash-LSH candidates (below) so only
    near-pairs reach this join.

    The join key is the 56-bit md5-derived shingle hash, not the
    shingle string: the equi-join shuffles 8 bytes per row instead of
    the n-gram text and compares integers (measured ~2x on the
    bench corpus).  Identical hashing on the DuckDB side keeps the
    twin value-exact; a 2^-56 collision would merge two shingles the
    same way on both engines.

    ``sh``: optionally pass a precomputed (persisted) hashed-shingle
    relation so several dedup passes over one corpus share a single
    tokenize+explode."""
    if sh is None:
        sh = hashed_shingles(docs, key, text, n).persist()
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .groupBy(F.col(f"a.{key}").alias("id_a"), F.col(f"b.{key}").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter
        .join(sizes.withColumnRenamed(key, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(key, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jac", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b",
                F.round(F.col("jac") * 10000).cast("bigint").alias("jaccard_x1e4"))
    )
    return out


def hashed_shingles(docs: DataFrame, key: str = "doc_id",
                    text: str = "text", n: int = 3) -> DataFrame:
    """(key, shingle bigint): distinct shingles as 56-bit md5 hashes —
    the shared relation signatures AND exact verification read (8-byte
    join/shuffle keys instead of n-gram text)."""
    return shingles(docs, key, text, n).select(
        key, _md5i(F.col("shingle")).alias("shingle"))


def contamination(docs: DataFrame, benchmark: DataFrame,
                  key: str = "doc_id", text: str = "text",
                  n: int = 3) -> DataFrame:
    """Benchmark-contamination detection — the decontamination pass
    every LLM training pipeline runs before training (n-gram overlap
    against held-out eval sets): (key, n_shared) for every training doc
    sharing at least one n-token shingle with the benchmark corpus.

    Spark shape: the training side reuses the 56-bit hashed-shingle
    relation (8-byte keys); the benchmark side is an eval set — tiny by
    definition — so its distinct shingles broadcast and the check is
    one map-side hash join over the training shingles, no shuffle of
    the big side.  Filtering out the flagged docs composes with
    clean_corpus via a left_anti on the returned keys."""
    tr = hashed_shingles(docs, key, text, n)
    bm = (hashed_shingles(benchmark, key, text, n)
          .select("shingle").distinct())
    return (tr.join(F.broadcast(bm), "shingle")
            .groupBy(key).agg(F.count(F.lit(1)).alias("n_shared")))


def _affine_coef(num_hashes: int, seed: int):
    rng = np.random.RandomState(seed)
    # 31-bit Mersenne-prime space: h' < 2^31, a < 2^15 -> a*h'+b < 2^47,
    # no int64 overflow under ANSI mode
    p = (1 << 31) - 1
    return p, [(int(rng.randint(1, 1 << 15)), int(rng.randint(0, 1 << 31)))
               for _ in range(num_hashes)]


def _signatures_from_hashed(sh: DataFrame, key: str,
                            num_hashes: int, seed: int) -> DataFrame:
    p, coef = _affine_coef(num_hashes, seed)
    h = F.pmod(F.col("shingle"), F.lit(p))
    aggs = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(p))).alias(f"mh{i}")
        for i, (a, b) in enumerate(coef)
    ]
    sigs = sh.groupBy(key).agg(*aggs)
    return sigs.select(key, F.array(*[f"mh{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_signatures(docs: DataFrame, key: str = "doc_id",
                       text: str = "text", n: int = 3,
                       num_hashes: int = 32, seed: int = 42) -> DataFrame:
    """(key, sig array<long>): MinHash over shingles with affine
    permutations h_i(x) = (a_i*x + b_i) mod p on a base 56-bit md5 hash.
    Deterministic given the seed."""
    return _signatures_from_hashed(
        hashed_shingles(docs, key, text, n), key, num_hashes, seed)


def minhash_lsh_pairs(docs: DataFrame, key: str = "doc_id", text: str = "text",
                      n: int = 3, num_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5, seed: int = 42,
                      sh: DataFrame | None = None) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    band bucket join generates candidates in ~linear time; the verify
    step recomputes exact Jaccard only on candidates — at 100 TB this is
    the only affordable shape (the all-pairs join above is the oracle).
    """
    rows = num_hashes // bands
    # ONE hashed-shingle relation feeds signatures, sizes, and the
    # exact verify (tokenize/explode once, int join keys throughout);
    # callers running several dedup passes pass their own shared one
    if sh is None:
        sh = hashed_shingles(docs, key, text, n).persist()
    sigs = _signatures_from_hashed(sh, key, num_hashes, seed)
    # band bucket = md5-derived int of the band's signature slice — an
    # exact DuckDB twin exists ('0x'||substr(md5(s),1,14)::BIGINT), so
    # the whole LSH pipeline is oracle-checkable end to end
    bands_df = sigs.select(
        key,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: _md5i(
                    F.concat_ws("_", F.lit("band"), b.cast("string"),
                                F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows)))),
            )
        ).alias("band", "bucket"),
    )
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(F.col(f"a.{key}").alias("id_a"), F.col(f"b.{key}").alias("id_b"))
        .distinct()
    )
    # exact verify on the candidate set only (the shared relation)
    sizes = sh.groupBy(key).agg(F.count("*").alias("sz"))
    ash = sh.withColumnRenamed(key, "id_a").withColumnRenamed("shingle", "s_a")
    bsh = sh.withColumnRenamed(key, "id_b2").withColumnRenamed("shingle", "s_b")
    inter = (
        cands.join(ash, "id_a")
        .join(bsh, (F.col("id_b") == F.col("id_b2")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    )
    return (
        inter
        .join(sizes.withColumnRenamed(key, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed(key, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jac", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b",
                F.round(F.col("jac") * 10000).cast("bigint").alias("jaccard_x1e4"))
    )


SIMHASH_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("simhash", LongType()),
])

# 56-bit signatures: the md5-derived term hash (_md5i) is 56 bits, so
# the same projection is computable exactly in DuckDB (oracle twin)
SIMHASH_BITS = 56
SIMHASH_BUCKETS = 64


def simhash_band_edges(max_hamming: int) -> list[int]:
    """Bit offsets of the max_hamming+1 disjoint signature bands."""
    n_bands = max_hamming + 1
    return [round(i * SIMHASH_BITS / n_bands) for i in range(n_bands + 1)]


def simhash(docs: DataFrame, key: str = "doc_id", text: str = "text") -> DataFrame:
    """56-bit SimHash per doc (tf-weighted token hash projection).

    One Arrow group per doc BUCKET (pmod(key, SIMHASH_BUCKETS)), not per
    doc — per-doc grouping means billions of one-doc Arrow groups at
    corpus scale (VERDICT r1).  Inside the UDF the ±tf bit-plane sums
    are segmented per doc with np.add.reduceat: no per-doc Python."""
    tf = (docs.select(key, F.explode(tokens_col(text)).alias("term"))
          .groupBy(key, "term").agg(F.count("*").alias("tf"))
          .withColumn("h", _md5i(F.col("term")))
          .withColumn("bkt", F.pmod(F.col(key), F.lit(SIMHASH_BUCKETS))))

    def _sim(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf[key].to_numpy(np.int64)
        h = pdf["h"].to_numpy(np.int64).astype(np.uint64)
        w = pdf["tf"].to_numpy(np.int64)
        order = np.argsort(doc, kind="stable")
        doc, h, w = doc[order], h[order], w[order]
        bits = ((h[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        weighted = (bits * 2 - 1) * w[:, None]  # exact integer +-tf sums
        starts = np.concatenate(([0], np.flatnonzero(doc[1:] != doc[:-1]) + 1))
        acc = np.add.reduceat(weighted, starts, axis=0)  # (n_docs, bits)
        sig = ((acc > 0).astype(np.uint64)
               << np.arange(SIMHASH_BITS, dtype=np.uint64)[None, :]).sum(axis=1)
        return pd.DataFrame({"doc_id": doc[starts],
                             "simhash": sig.astype(np.int64)})

    return tf.groupBy("bkt").applyInPandas(_sim, SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, key: str = "doc_id", text: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate generation by signature banding with ``max_hamming + 1``
    bands (pigeonhole: a pair within distance d differs in at most d
    bands, so with d+1 disjoint bands at least one band is identical) —
    candidate recall is exact, then the bit_count filter is exact."""
    n_bands = max_hamming + 1
    # split the signature bits into n_bands contiguous spans (widths
    # differ by at most 1); each band value = span bits, disjoint
    edges = simhash_band_edges(max_hamming)
    sigs = simhash(docs, key, text)
    band_arr = F.array(*[
        F.shiftrightunsigned(F.col("simhash"), edges[b]).bitwiseAND(
            F.lit((1 << (edges[b + 1] - edges[b])) - 1))
        for b in range(n_bands)
    ])
    bands = sigs.select(
        key, "simhash", F.posexplode(band_arr).alias("band", "bucket"))
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(F.col(f"a.{key}").alias("id_a"), F.col("a.simhash").alias("sig_a"),
                F.col(f"b.{key}").alias("id_b"), F.col("b.simhash").alias("sig_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.withColumn("hamming", ham).filter(ham <= max_hamming) \
        .select("id_a", "id_b", "hamming")


def embedding_neardup_pairs(emb: DataFrame, key: str = "vec_id",
                            vec: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Exact pairwise cosine >= threshold (a < b).  All-pairs — the
    oracle/verify path; scale path = ops.similarity.lsh_buckets.

    Vectors are cast to array<double> BEFORE any arithmetic: float32
    partial products diverge from a double oracle by ~1e-7, enough to
    flip 1e-4-rounded comparisons."""
    dvec = F.col(vec).cast("array<double>")
    norm = F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x))
    e = emb.select(F.col(key), dvec.alias("v"), norm.alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col(f"a.{key}") < F.col(f"b.{key}"))
        .withColumn("cos", dot / (F.col("a.nrm") * F.col("b.nrm")))
        .filter(F.col("cos") >= threshold)
        .select(F.col(f"a.{key}").alias("id_a"), F.col(f"b.{key}").alias("id_b"),
                F.round(F.col("cos") * 10000).cast("bigint").alias("cos_x1e4"))
    )


#: edge-count ceiling for the driver union-find fast path below; the
#: collected edge list at this bound is ~32 MB — the same order as a
#: broadcast-join build side, which is exactly the size class where
#: shipping data to one node beats a multi-round distributed fixpoint
DEDUP_CC_DRIVER_MAX_EDGES = 2_000_000


def _dedup_clusters_driver(spark, e: DataFrame) -> DataFrame:
    """Union-find fast path for a bounded edge set: ~3 driver jobs
    total instead of jobs-per-propagation-round.  Produces the
    identical fixpoint (cluster_id = component min id)."""
    pdf = e.toPandas()
    a = pdf["a"].to_numpy(np.int64)
    b = pdf["b"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(verts)}
    parent = np.arange(len(verts))

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:       # path compression
            parent[i], i = root, parent[i]
        return root

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            parent[rx if rx > ry else ry] = rx if rx < ry else ry
    roots = np.array([find(i) for i in range(len(verts))])
    # component label = min vertex id in the component; roots are not
    # ordered by id, so take the min over members explicitly
    label = np.full(len(verts), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(label, roots, verts)
    cluster = label[roots]
    out = pd.DataFrame({
        "doc_id": verts,
        "cluster_id": cluster,
        "is_keeper": (verts == cluster).astype(np.int32),
    })
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    return spark.createDataFrame(out, StructType([
        StructField("doc_id", LongType()),
        StructField("cluster_id", LongType()),
        StructField("is_keeper", IntegerType()),
    ]))


def dedup_clusters(pairs: DataFrame, key_a: str = "id_a",
                   key_b: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs ->
    (doc_id, cluster_id, is_keeper).

    Any of the pair generators above (exact, LSH-verified, SimHash,
    embedding) yields PAIRS; an actual dedup pass needs GROUPS — a ~ b
    and b ~ c must collapse to one keeper even when a ~ c was never
    emitted.  cluster_id = the component's minimum id (the keeper under
    the first-wins convention the builder's url dedup uses).

    Size-gated execution (r7, guide §3.1's broadcast principle): the
    pair relation is counted once; at or below
    ``DEDUP_CC_DRIVER_MAX_EDGES`` edges the components are solved by a
    driver-side union-find over the collected (a, b) ids — a bounded
    collect of the same size class as a broadcast-join build side —
    because the distributed fixpoint pays multiple shuffle rounds of
    pure latency on data one machine folds in milliseconds.  Above the
    bound, the distributed path below runs unchanged.  Both produce
    the identical fixpoint (tested).

    Distributed shape: iterative min-label propagation — label(v)
    starts at v and each round takes the min over neighbors' labels;
    converges in component-diameter rounds (near-dup components are
    shallow: at web scale essentially star-shaped around a template).
    Lineage is cut per round with localCheckpoint like
    ops/graph.transitive_closure; per-round cost is one join + one
    groupBy on the EDGE relation, linear in |E|.  Exact DuckDB twin:
    recursive min-reachable-id.
    """
    e = pairs.select(F.col(key_a).alias("a"), F.col(key_b).alias("b"))
    ep = e.persist()
    try:
        n_edges = ep.count()
    except Exception:
        ep.unpersist()
        raise
    if n_edges <= DEDUP_CC_DRIVER_MAX_EDGES:
        try:
            return _dedup_clusters_driver(ep.sparkSession, ep)
        finally:
            ep.unpersist()
    e = ep
    # materialize the edge relation ONCE: every propagation round joins
    # it, and without the checkpoint each round would re-run the whole
    # upstream pair-generation pipeline (e.g. the LSH candidate+verify
    # flow) — measured ~4x on the bench corpus
    edges = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))) \
        .distinct().localCheckpoint(eager=True)
    ep.unpersist()
    labels = (edges.select(F.col("a").alias("v")).distinct()
              .withColumn("label", F.col("v")))
    converged = False
    for _ in range(max_iter):
        neigh = (edges.join(labels, edges["a"] == labels["v"])
                 .select(F.col("b").alias("v"), F.col("label")))
        # lazy checkpoint: the convergence count below is the round's
        # ONE action — it materializes the checkpoint and tests the
        # fixpoint in the same job (the old eager checkpoint + two
        # counts cost three driver jobs per round, pure fixed latency)
        new = (labels.unionByName(neigh)
               .groupBy("v").agg(F.min("label").alias("label"))
               .localCheckpoint(eager=False))
        # fixpoint: both sides have one row per v, so every (v, label)
        # is unchanged iff nothing in `new` misses its twin in `labels`
        if new.join(labels, ["v", "label"], "left_anti").count() == 0:
            labels = new
            converged = True
            break
        labels = new
    if not converged:
        # a component with diameter > max_iter would return split
        # clusters (multiple keepers) — surface it instead of handing
        # silently-wrong labels downstream
        log.warning(
            "dedup_clusters: min-label propagation did not converge "
            "within max_iter=%d rounds; some components have diameter "
            "> max_iter and are reported as multiple clusters. "
            "Raise max_iter.", max_iter)
    return labels.select(
        F.col("v").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("v") == F.col("label")).cast("int").alias("is_keeper"))


def substring_dup_spans(docs: DataFrame, key: str = "doc_id",
                        text: str = "text", w: int = 8) -> DataFrame:
    """Cross-document exact-substring duplication (the suffix-array
    dedup of Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better") re-expressed Spark-first.

    A distributed suffix array is the wrong tool on Spark (global
    character-order sort + LCP scan = one giant total order); the
    equivalent detector is windowed hashing: every ``w``-token sliding
    window is hashed, a window hash seen in >1 DISTINCT document marks
    an exact >=w-token cross-doc duplicate span.  Per doc we return how
    much of it is covered by such spans — the signal used to cut
    boilerplate/licence blocks that shingle-Jaccard dilutes away on
    long pages.

    Output: (key, n_tokens, n_windows, n_dup_windows, dup_cov_tokens,
    dup_frac_x1e4) where dup_cov_tokens is |union of [pos, pos+w)| over
    duplicated windows — computed with a lag window (first interval
    contributes w, each next min(w, gap)), NEVER by exploding w
    positions per window: coverage stays O(#dup windows) rows.

    Scale shape: one explode (corpus token count rows), one groupBy on
    the 56-bit window hash (8-byte shuffle keys), one semi-join back,
    one per-doc window+groupBy.  The duplicated-hash relation is
    corpus-sized in the worst case, so the join back is a plain
    shuffle join, not a broadcast.
    """
    # NULL text → 0 tokens, not NULL (F.size(NULL) is NULL and would
    # leak into n_tokens / the dup_frac denominator).  The token array
    # is materialized as a column BEFORE the window transform — a
    # lambda referencing the tokenizer expression re-runs the regex per
    # window (~n_tokens full-text regex passes per doc; the shingles()
    # note), which dominated this operator's profile.
    d = docs.select(
        key,
        F.coalesce(tokens_col(text), F.array().cast("array<string>"))
        .alias("tk"))
    toks = F.col("tk")
    win_arr = F.when(
        F.size(toks) >= w,
        F.transform(F.sequence(F.lit(0), F.size(toks) - w),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, w))),
    ).otherwise(F.array().cast("array<string>"))
    wins = d.select(key, F.posexplode(win_arr).alias("pos", "win")) \
        .select(key, "pos", _md5i(F.col("win")).alias("h"))
    dup_h = (wins.groupBy("h")
             .agg(F.count_distinct(F.col(key)).alias("nd"))
             .filter(F.col("nd") > 1).select("h"))
    dup_wins = wins.join(dup_h, "h").select(key, "pos")
    from pyspark.sql import Window
    wspec = Window.partitionBy(key).orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(wspec)
    cov = (dup_wins
           .withColumn("contrib", F.when(gap.isNull(), F.lit(w))
                       .otherwise(F.least(F.lit(w), gap)))
           .groupBy(key)
           .agg(F.count("*").alias("n_dup_windows"),
                F.sum("contrib").alias("dup_cov_tokens")))
    base = d.select(
        key, F.size(toks).alias("n_tokens"),
        F.greatest(F.size(toks) - w + 1, F.lit(0)).alias("n_windows"))
    return (base.join(cov, key, "left")
            .select(key, "n_tokens", "n_windows",
                    F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
                    F.coalesce("dup_cov_tokens", F.lit(0)).alias("dup_cov_tokens"),
                    F.when(F.col("n_tokens") > 0,
                           F.round(F.coalesce("dup_cov_tokens", F.lit(0))
                                   * 10000.0 / F.col("n_tokens")))
                    .otherwise(F.lit(0)).cast("bigint").alias("dup_frac_x1e4")))


def line_dedup(docs: DataFrame, key: str = "doc_id",
               text: str = "text") -> DataFrame:
    """C4-style GLOBAL line-level exact dedup (Raffel et al. 2020 §2.2
    dedup "three-sentence spans" corpus-wide; Dolma/RefinedWeb run the
    same pass at line/paragraph granularity): every distinct non-empty
    line keeps only its FIRST occurrence — min (key, pos) across the
    whole corpus, including repeats within one document — and each doc
    is reassembled from its surviving lines in original order.

    Output: (key, n_lines, n_kept, text_dedup).

    Scale shape — deliberately NOT a row_number window: boilerplate
    lines ("All rights reserved.") occur billions of times at web
    scale, and a window partitioned by line hash sorts each group in
    ONE task (unboundable skew).  Instead the winner per line is
    min(struct(key, pos, line)) — a map-side-combinable aggregate, so
    the giant group collapses to one row per partition before the
    shuffle.  Two shuffles total: the winner agg on the 56-bit line
    hash and the per-doc reassembly groupBy; no joins on the skewed
    hash at all.
    """
    raw = F.split(F.coalesce(F.col(text), F.lit("")), "\n")
    lines = (docs.select(key, F.posexplode(raw).alias("pos", "line"))
             .filter(F.length("line") > 0))
    base = docs.select(
        key,
        F.size(F.filter(raw, lambda x: F.length(x) > 0)).alias("n_lines"))
    # one row per distinct line: its first occurrence, text carried
    # along inside the min-struct so no join back is needed
    win = (lines.groupBy(_md5i(F.col("line")).alias("h"))
           .agg(F.min(F.struct(key, "pos", "line")).alias("w"))
           .select(F.col(f"w.{key}").alias(key), F.col("w.pos").alias("pos"),
                   F.col("w.line").alias("line")))
    rebuilt = (win.groupBy(key)
               .agg(F.count("*").alias("n_kept"),
                    F.concat_ws(
                        "\n",
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"])).alias("text_dedup")))
    return (base.join(rebuilt, key, "left")
            .select(key, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup")))


def semantic_dedup_pairs(emb: DataFrame, n_cells: int = 16,
                         threshold: float = 0.30, key: str = "vec_id",
                         vec: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings into cells, then compare
    pairs only WITHIN a cell — the all-pairs O(N²) cosine becomes
    O(sum of cell²), the paper's exact trick for web scale.

    Cells reuse the deterministic IVF assignment
    (similarity.ivf_centroids/ivf_assign: centroids = the n_cells
    smallest keys, nearest-by-cosine, smallest cid on ties) so the
    DuckDB twin reproduces the clustering bit-for-bit.  Output:
    (id_a, id_b, cell, cos_x1e4) for within-cell pairs with
    cosine >= threshold, a < b; feed to ``dedup_clusters`` to pick
    keepers (SemDeDup keeps one doc per similarity group).

    Scale shape: the pair join is an equi-join on ``cell`` (hash
    partition by cell, pairs form per-partition) — the corpus never
    cross-joins globally.  At 100 TB, ``cell`` becomes the vector
    table's partition key and each cell's pairs build in one task;
    skewed cells split by the same salting lever the posting builder
    uses.  Float32 inputs are cast to double BEFORE arithmetic (the
    embedding_neardup_pairs precision note).
    """
    from .similarity import ivf_assign, ivf_centroids
    C, cids = ivf_centroids(emb, n_cells, key, vec)
    assigned = ivf_assign(emb, C, cids, key, vec)
    dvec = F.col(vec).cast("array<double>")
    norm = F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x * x))
    e = (emb.select(F.col(key), dvec.alias("v"), norm.alias("nrm"))
         .join(assigned.select(key, "cell"), key))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .withColumn("cos", dot / (F.col("a.nrm") * F.col("b.nrm")))
        .filter(F.col("cos") >= threshold)
        .select(F.col(f"a.{key}").alias("id_a"),
                F.col(f"b.{key}").alias("id_b"),
                F.col("a.cell").alias("cell"),
                F.round(F.col("cos") * 10000).cast("bigint")
                .alias("cos_x1e4"))
    )
