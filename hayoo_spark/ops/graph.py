"""Graph / ranking operators — the reference's package-rank family.

The reference builds a package dependency DAG, closes it transitively,
and computes a dependents-prestige rank used as the per-document boost
(hayooIndexer/src/Hayoo/PackageRank.hs:141-269).  The engine's BM25
replaces rank as the primary scoring signal (SURVEY.md §2.4 R5 note),
but the operators themselves are general graph tooling a pipeline
needs; here they are Spark-first iterative DataFrame algorithms.

- ``transitive_closure``: frontier expansion with union-distinct per
  round and ``localCheckpoint`` to truncate lineage (the classic
  iterate-to-fixpoint shape; GraphFrames would slot in unchanged).
  Reference: PackageRank.hs:176-183 `r ∘ r` fixpoint.
- ``dependents_rank``: rank(p) = w·(1/w + Σ_{q→p} rank(q)), w = 0.5
  (PackageRank.hs:248-261) — equivalently the weighted count of all
  walks ending at p: rank(p) = Σ_i w^i · (#walks of length i into p),
  computed by iterated sparse matrix-vector products (joins).  Weights
  are powers of 0.5 (exact binary fractions), so a SQL twin using a
  recursive CTE reproduces the values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_W = 0.5  # reference weight (PackageRank.hs:263 rankingStd)


def transitive_closure(edges: DataFrame, src: str = "src",
                       dst: str = "dst", max_iter: int = 50) -> DataFrame:
    """All (src, dst) pairs connected by >= 1 directed path.

    Each round joins the current reachability set with the base edges
    and unions new pairs; stops at fixpoint.  ``localCheckpoint``
    truncates the growing plan lineage (the standard guard for
    iterative DataFrame algorithms)."""
    base = edges.select(F.col(src).alias("src"),
                        F.col(dst).alias("dst")).distinct()
    paths = base.localCheckpoint()
    n = paths.count()
    for _ in range(max_iter):
        grown = (
            paths.alias("p")
            .join(base.alias("e"), F.col("p.dst") == F.col("e.src"))
            .select(F.col("p.src").alias("src"), F.col("e.dst").alias("dst"))
            .unionByName(paths)
            .distinct()
            .localCheckpoint()
        )
        m = grown.count()
        if m == n:
            break
        paths, n = grown, m
    return paths


def cycle_edges(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_iter: int = 50) -> DataFrame:
    """R4 cycle-edge filter: the edges participating in any directed
    cycle — (u, v) is cyclic iff v reaches u.

    The reference removes cycle-closing edges with a SEQUENTIAL
    input-order-dependent union-find fold
    (hayooIndexer/src/Hayoo/PackageRank.hs:197-241) — semantics a
    distributed engine cannot reproduce deterministically without
    serializing the edge stream.  Documented deviation: this identifies
    the order-INDEPENDENT cyclic edge set (u,v with v ⇝ u), which a
    caller drops to obtain a DAG (the reference's goal), and which has
    an exact recursive-CTE twin."""
    base = edges.select(F.col(src).alias("src"),
                        F.col(dst).alias("dst")).distinct()
    closure = transitive_closure(base, max_iter=max_iter)
    back = closure.select(F.col("dst").alias("src"),
                          F.col("src").alias("dst"))
    return base.join(back, ["src", "dst"], "left_semi")


def dependents_rank(nodes: DataFrame, edges: DataFrame, key: str = "node",
                    src: str = "src", dst: str = "dst",
                    w: float = RANK_W, max_iter: int = 50) -> DataFrame:
    """Reference package rank over a DAG: rank(p) = w·(1/w + Σ_{q→p}
    rank(q)) — computed as Σ_i w^i · f_i(p) with f_0 ≡ 1 and
    f_{i+1}(p) = Σ_{q→p} f_i(q) (walk counting; converges in DAG-depth
    rounds).  Returns (key, rank double, rank_x1e4 bigint)."""
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    total = nodes.select(F.col(key).alias("node")) \
        .withColumn("rank", F.lit(1.0))
    # frontier invariant: g_i(p) = w^i * (#walks of length i into p);
    # each round g_{i+1}(p) = w * sum over edges q->p of g_i(q)
    frontier = total
    for _ in range(max_iter):
        frontier = (
            frontier.alias("f")
            .join(base.alias("e"), F.col("f.node") == F.col("e.src"))
            .groupBy(F.col("e.dst").alias("node"))
            .agg((F.sum("f.rank") * w).alias("rank"))
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        total = (total.unionByName(frontier)
                 .groupBy("node").agg(F.sum("rank").alias("rank"))
                 .localCheckpoint())
    return total.select(
        F.col("node").alias(key),
        F.col("rank"),
        F.round(F.col("rank") * 10000).cast("bigint").alias("rank_x1e4"))
