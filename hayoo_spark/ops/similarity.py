"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline.  Dot product stays
  JVM-side (zip_with + aggregate, whole-stage codegen) — per the
  input_hint, no per-row Python;
- LSH-bucketed ANN: deterministic random-hyperplane signatures bucket
  vectors; probing only the query's bucket(s) turns top-k from O(N)
  into O(N / 2^bits) per probe — the 100 TB path.  Recall measured
  against the brute-force baseline in tests;
- batch variant (many queries at once) via a broadcast matrix and a
  mapInPandas matmul — Arrow batches, numpy BLAS inside.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_lit(vec_col, qvec: list[float]):
    q = F.array([F.lit(float(x)) for x in qvec])
    return F.aggregate(F.zip_with(vec_col, q, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Exact cosine top-k, fully declarative (ORDER BY ... LIMIT k ->
    TakeOrderedAndProject, no full sort).  Ties broken by key."""
    qn = float(np.sqrt(np.dot(qvec, qvec)))
    dvec = F.col(vec).cast("array<double>")  # double before arithmetic
    norm = F.sqrt(F.aggregate(dvec, F.lit(0.0), lambda a, x: a + x * x))
    return (
        emb.select(
            F.col(key),
            (_dot_lit(dvec, qvec) / (norm * qn)).alias("cos"),
        )
        .withColumn("cos_x1e6", F.round(F.col("cos") * 1e6).cast("bigint"))
        .orderBy(F.col("cos").desc(), F.col(key))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(bits, dim)).astype(np.float64)


def lsh_bucket_expr(vec_col, planes: np.ndarray):
    """Signed-projection bucket id as a JVM-side expression chain."""
    bits = []
    dvec = vec_col.cast("array<double>")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(dvec, F.array([F.lit(float(x)) for x in p]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                    key: str = "vec_id", vec: str = "embedding",
                    bits: int = 8, seed: int = 42,
                    multiprobe: int = 1) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket (plus
    `multiprobe-1` nearest buckets by flipped sign bits).

    At scale the bucket id is a partition/cluster key, so the scan is
    partition-pruned; here it is a filter Catalyst pushes to parquet.
    """
    planes = hyperplanes(len(qvec), bits, seed)
    proj = planes @ np.asarray(qvec, dtype=np.float64)
    qsig = int(sum((1 << i) for i, v in enumerate(proj) if v >= 0))
    probes = [qsig]
    if multiprobe > 1:
        order = np.argsort(np.abs(proj))  # least-confident bits first
        for i in order[: multiprobe - 1]:
            probes.append(qsig ^ (1 << int(i)))
    bucketed = emb.withColumn("bucket", lsh_bucket_expr(F.col(vec), planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, qvec, k, key, vec)


def ivf_centroids(emb: DataFrame, n_cells: int = 16, key: str = "vec_id",
                  vec: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Deterministic IVF centroids: the vectors with the n_cells
    smallest keys (cid = that key).  A k-means refinement is an offline
    batch job at scale; the bucketing/probing mechanics — which is what
    the engine provides — are identical either way."""
    rows = emb.orderBy(key).limit(n_cells).select(key, vec).collect()
    C = np.array([list(r[vec]) for r in rows], dtype=np.float64)
    cids = np.array([r[key] for r in rows], dtype=np.int64)
    return C, cids


def ivf_assign(emb: DataFrame, C: np.ndarray, cids: np.ndarray,
               key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """(key, cell): nearest centroid by cosine (|v| cancels, so argmax
    of dot/|centroid|; ties -> smallest cid).  mapInPandas matmul with
    the closure-broadcast centroid matrix — at 100 TB `cell` becomes
    the partition key of the vector table, so probes prune partitions."""
    Cw = (C / np.linalg.norm(C, axis=1, keepdims=True).clip(min=1e-12)).T

    def assign(batches):
        for pdf in batches:
            m = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            cell = np.argmax(m @ Cw, axis=1)  # first max = smallest idx
            yield pd.DataFrame({key: pdf[key].to_numpy(),
                                "cell": cids[cell]})

    return emb.select(key, vec).mapInPandas(assign, f"{key} long, cell long")


def ivf_cosine_topk(emb: DataFrame, qvec: list[float], k: int = 10,
                    n_cells: int = 16, n_probe: int = 4,
                    key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """IVF ANN top-k: score only vectors assigned to the query's
    n_probe nearest cells.  O(N/n_cells * n_probe) per query plus one
    linear assignment pass (amortized across queries / precomputed as a
    stored column at scale)."""
    C, cids = ivf_centroids(emb, n_cells, key, vec)
    q = np.asarray(qvec, dtype=np.float64)
    s = (C @ q) / np.linalg.norm(C, axis=1).clip(min=1e-12)
    order = np.lexsort((cids, -s))[:n_probe]  # score desc, cid asc ties
    probes = [int(cids[i]) for i in order]
    assigned = ivf_assign(emb, C, cids, key, vec)
    cand = emb.join(assigned.filter(F.col("cell").isin(probes)), key)
    return cosine_topk(cand, qvec, k, key, vec)


def batch_cosine_topk(emb: DataFrame, queries: np.ndarray, k: int = 10,
                      key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Many-query exact top-k in one pass: mapInPandas matmul against a
    closure-broadcast query matrix, then a grouped global top-k.

    Output: (query_id, vec_id, cos) — k rows per query."""
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    qhat = q / qn

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (m / nrm) @ qhat.T  # (batch, n_queries)
            n, nq = sims.shape
            kk = min(k, n)
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # per query
            out_q, out_v, out_c = [], [], []
            keys = pdf[key].to_numpy()
            for qi in range(nq):
                rows = part[:, qi]
                out_q.extend([qi] * len(rows))
                out_v.extend(keys[rows])
                out_c.extend(sims[rows, qi])
            yield pd.DataFrame({"query_id": out_q, key: out_v, "cos": out_c})

    partial = emb.select(key, vec).mapInPandas(
        score, f"query_id int, {key} long, cos double")
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(key)))
    return partial.withColumn("rn", w).filter(F.col("rn") <= k).drop("rn")
