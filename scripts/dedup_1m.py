#!/usr/bin/env python3
"""1M-doc scale proof for the LLM-pipeline corpus operators.

The dedup/quality family's driver-oracle entries run on the tiny
testdata `documents` tables; this run is their 100 TB-credibility
artifact: a 1M-doc synthetic web corpus with PLANTED structure —
exact duplicates, near duplicates (token-edited copies), and a shared
boilerplate block — pushed through the full assembly pipeline at
local[32]:

  exact_duplicates -> minhash_lsh_pairs (+ dedup_clusters) ->
  substring_dup_spans -> quality/lang/clean -> hash_split ->
  pack_sequences

Records per-stage wall time + docs/sec AND recall of the planted
structure (a throughput number over an operator that misses its dups
is meaningless).  Writes BENCH/dedup_1m.json and prints it.

Corpus shape mirrors the bench generator (Zipf token stream) at a
web-realistic ~180 tokens/doc; all randomness is seeded so reruns are
byte-comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = int(os.environ.get("DEDUP_DOCS", "1000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SHM = os.environ.get("HAYOO_BENCH_SHM", "/dev/shm/hayoo_bench")
OUT = os.path.join(REPO, "BENCH", "dedup_1m.json")

MEAN_TOKENS = 180
VOCAB = 50_000
EXACT_DUP_RATE = 0.01     # copies of earlier docs
NEAR_DUP_RATE = 0.02      # ~3% token-edited copies of earlier docs
BOILER_RATE = 0.10        # docs carrying the shared footer block
BOILER = ("all rights reserved copyright notice terms of service "
          "privacy policy contact webmaster for details")  # 14 tokens


def synth_corpus(path: str) -> dict:
    """Deterministic 1M-doc parquet with planted dup structure.

    Generation is chunked numpy -> arrow (no Spark; the corpus is the
    INPUT, its cost is reported separately from operator throughput).
    Returns planted-truth summaries used for recall checks.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260817)
    os.makedirs(path, exist_ok=True)
    langs = np.array(["en", "de", "fr"])
    vocab = np.array([f"w{i:05d}" for i in range(VOCAB)])
    chunk = 50_000
    exact_pairs = []
    near_pairs = []
    n_boiler = 0
    t0 = time.monotonic()
    for c0 in range(0, DOCS, chunk):
        n = min(chunk, DOCS - c0)
        lens = np.maximum(20, rng.poisson(MEAN_TOKENS, size=n))
        texts = []
        ids = np.arange(c0, c0 + n, dtype=np.int64)
        for i in range(n):
            doc_id = c0 + i
            u = rng.random()
            if u < EXACT_DUP_RATE and texts:
                j = int(rng.integers(0, len(texts)))
                texts.append(texts[j])
                exact_pairs.append((c0 + j, doc_id))
                continue
            toks = vocab[np.minimum(
                rng.zipf(1.35, size=int(lens[i])) - 1, VOCAB - 1)]
            if u < EXACT_DUP_RATE + NEAR_DUP_RATE and texts:
                # token-edit an earlier doc in this chunk: ~3% of
                # positions replaced -> Jaccard stays well over 0.5
                j = int(rng.integers(0, len(texts)))
                base = np.array(texts[j].split())
                k = max(1, int(0.03 * len(base)))
                pos = rng.choice(len(base), size=min(k, len(base)),
                                 replace=False)
                base[pos] = vocab[rng.integers(0, VOCAB, size=len(pos))]
                texts.append(" ".join(base))
                near_pairs.append((c0 + j, doc_id))
                continue
            t = " ".join(toks)
            if u > 1.0 - BOILER_RATE:
                t = t + " " + BOILER
                n_boiler += 1
            texts.append(t)
        tbl = pa.table({
            "doc_id": ids,
            "text": texts,
            "lang": langs[rng.integers(0, 3, size=n)],
            "source": np.char.add("shard", (ids % 64).astype(str)),
        })
        pq.write_table(tbl, f"{path}/part-{c0:08d}.parquet")
    return {
        "synth_sec": round(time.monotonic() - t0, 1),
        "exact_pairs": exact_pairs,
        "near_pairs": near_pairs,
        "n_boiler": n_boiler,
    }


def main():
    from pyspark.sql import functions as F

    from hayoo_spark.ops import corpus as corpus_ops
    from hayoo_spark.ops import dedup, textstats
    from hayoo_spark.session import get_spark

    path = os.path.join(SHM, f"dedup_corpus_{DOCS}")
    truth_path = path + ".truth.json"
    if not os.path.exists(truth_path):
        info = synth_corpus(path)
        with open(truth_path, "w") as f:
            json.dump(info, f)
    with open(truth_path) as f:
        truth = json.load(f)

    spark = get_spark(app_name="dedup-1m", cores=CPUS,
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    out: dict = {"docs": n_docs, "cores": CPUS,
                 "synth_sec": truth["synth_sec"],
                 "mean_tokens": MEAN_TOKENS}
    stages: dict = {}
    out["stages"] = stages

    def stage(name, fn):
        t0 = time.monotonic()
        r = fn()
        dt = time.monotonic() - t0
        stages[name] = {"sec": round(dt, 1),
                        "docs_per_sec": round(n_docs / dt, 0), **r}
        print(f"  {name}: {dt:.1f}s  {r}", flush=True)
        return r

    # --- exact dedup: planted copies must ALL land in groups
    exact_truth = {tuple(p) for p in truth["exact_pairs"]}

    def run_exact():
        groups = dedup.exact_duplicates(docs).select(
            "n", "members").collect()
        # chains (copy-of-a-copy) key groups by root;
        # recall = planted pairs whose BOTH ids share a group
        byid = {}
        for g in groups:
            root = min(g["members"])
            for m in g["members"]:
                byid[m] = root
        hit = sum(1 for a, b in exact_truth
                  if byid.get(a) is not None and byid.get(a) == byid.get(b))
        return {"groups": len(groups),
                "planted": len(exact_truth),
                "recall": round(hit / max(1, len(exact_truth)), 4)}

    stage("exact_dedup", run_exact)

    # --- shared hashed-shingle relation (persisted once, like the
    # contract entries' memo): its cost is its own stage
    sh = dedup.hashed_shingles(docs, n=3)

    def run_shingles():
        sh_p = sh.persist()
        cnt = sh_p.count()
        return {"shingles": cnt}

    stage("hashed_shingles", run_shingles)

    # --- MinHash-LSH near-dup pairs + planted-pair recall
    near_truth = {tuple(p) for p in truth["near_pairs"]}

    def run_lsh():
        pairs = dedup.minhash_lsh_pairs(docs, n=3, threshold=0.5, sh=sh)
        got = {(min(a, b), max(a, b)) for a, b in
               pairs.select("id_a", "id_b").collect()}
        hit = len(near_truth & got)
        return {"pairs": len(got), "planted": len(near_truth),
                "recall": round(hit / max(1, len(near_truth)), 4)}

    stage("minhash_lsh", run_lsh)

    # --- exact-substring spans: boilerplate carriers must show
    # dup coverage >= the footer window count
    def run_spans():
        spans = dedup.substring_dup_spans(docs, w=8)
        agg = spans.agg(
            F.count(F.when(F.col("n_dup_windows") > 0, 1)).alias("n_dup"),
            F.sum("dup_cov_tokens").alias("cov")).collect()[0]
        return {"docs_with_dup_spans": agg["n_dup"],
                "planted_boiler_docs": truth["n_boiler"],
                "covered_tokens": int(agg["cov"])}

    stage("substring_spans", run_spans)

    # --- quality + lang + composed clean (no dedup side to isolate
    # the scan-shaped stages)
    def run_quality():
        q = textstats.quality_score(docs).agg(
            F.avg("quality_x1e4").alias("avg_q")).collect()[0]
        return {"avg_quality_x1e4": round(float(q["avg_q"]), 1)}

    stage("quality_score", run_quality)

    def run_split():
        sp = corpus_ops.hash_split(docs, {"train": 0.9, "val": 0.05,
                                          "test": 0.05})
        counts = {r["split"]: r["n"] for r in
                  sp.groupBy("split").agg(F.count("*").alias("n")).collect()}
        return {"counts": counts}

    stage("hash_split", run_split)

    def run_pack():
        p = corpus_ops.pack_sequences(docs, budget=2048, shard="source")
        agg = p.agg(F.max("bin_id").alias("mx"),
                    F.sum("n_tokens").alias("toks")).collect()[0]
        return {"total_tokens": int(agg["toks"]),
                "max_bin_id": int(agg["mx"])}

    stage("pack_sequences", run_pack)

    sh.unpersist()
    out["total_sec"] = round(sum(s["sec"] for s in stages.values()), 1)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
