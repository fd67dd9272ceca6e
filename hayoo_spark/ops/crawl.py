"""Crawl-frontier scheduling loop (SURVEY.md §2 S5 analogue).

The reference crawler (hayooCrawler / hunt-crawler's processDocuments
loop) repeats: pop the frontier, fetch pages, extract links, filter
them through the URI allow/deny config, normalize, and enqueue unseen
urls for the next round, to a depth bound.  The FETCH is network I/O a
caller plugs in; everything else is a pure relation on the link graph —
this module implements that scheduling relation as a depth-bounded BFS
with the S6/S7 frontier predicate and canonical rewrite applied every
round (ops/urls.py).

Spark shape: each round is one hash join frontier ⋈ links plus a
left-anti against the visited set; lineage is cut with localCheckpoint
every few rounds exactly like ops/graph.transitive_closure, so a deep
crawl cannot accumulate an unbounded plan.  At web scale the links
relation is the crawl-graph table (bucketed by src) and a round's
frontier is small relative to it — the join broadcasts the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import urls as U

CHECKPOINT_EVERY = 4


def expand_frontier(links: DataFrame, seeds: DataFrame, rounds: int = 3,
                    src: str = "src", href: str = "href",
                    allow_host_re: str = r"\.org",
                    deny_ext: tuple[str, ...] = U.DENY_EXT,
                    robots: DataFrame | None = None) -> DataFrame:
    """Depth-bounded BFS over the link graph from ``seeds``.

    ``links``: (src, href) — raw outgoing links per page url.
    ``seeds``: (url) — entry points (assumed already canonical).
    ``robots``: optional (host, robots_txt) relation — when given,
    every round's new frontier is robots-filtered before scheduling
    (the crawler framework's enableRobotsTxt switch; the reference
    turns it off for its own mirror, HayooIndexer.hs:116,123).
    Returns (url, depth): every url the crawler would schedule within
    ``rounds`` hops, at its FIRST (minimum) depth — the dedup the
    reference's visited-set gives a crawl queue."""
    norm_links = (links
                  .filter(U.frontier_filter_col(href, allow_host_re,
                                                deny_ext))
                  .select(U.normalize_url_col(src).alias("src"),
                          U.normalize_url_col(href).alias("dst"))
                  .filter(F.col("src") != F.col("dst"))
                  .distinct())
    visited = seeds.select(F.col("url"), F.lit(0).alias("depth"))
    frontier = visited.select("url")
    for depth in range(1, rounds + 1):
        # EXPLICIT broadcast: the frontier is a derived relation with
        # no size stats, so Catalyst can't know it's the small side —
        # without the hint a round may shuffle the full links table.
        # One crawl round's frontier is bounded by politeness budget
        # (thousands of hosts × per-host cap), always the small side
        # against a web-scale links table.
        nxt = (norm_links
               .join(F.broadcast(frontier.withColumnRenamed("url", "src")),
                     "src")
               .select(F.col("dst").alias("url"))
               .distinct()
               .join(visited.select("url"), "url", "left_anti")
               .withColumn("depth", F.lit(depth)))
        if robots is not None:
            from ..sources.robots import robots_filter
            nxt = robots_filter(nxt, robots)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        if depth % CHECKPOINT_EVERY == 0:
            # cut lineage on the ACCUMULATING relation — the frontier
            # derives from it, so this bounds both plans
            visited = visited.localCheckpoint(eager=True)
        frontier = nxt.select("url")
    return visited
