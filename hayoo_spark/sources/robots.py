"""robots.txt evaluation for the crawl frontier (SURVEY.md §2 S1/S5).

The reference's crawler framework carries a per-crawl robots.txt
switch (``disableRobotsTxt``/``enableRobotsTxt`` crawler config —
hayooIndexer/src/HayooIndexer.hs:116,123 turns it OFF for hackage
because it crawls its own mirror); a webtext deployment of this engine
needs the ON path.  This module implements the matcher per RFC 9309:

- groups selected by ``User-agent`` (most-specific match: exact agent
  token beats ``*``),
- ``Allow``/``Disallow`` rules with ``*`` wildcards and ``$`` end
  anchor,
- longest-match-wins precedence; tie → Allow; no match → allowed;
  empty Disallow → allowed,

and a Spark-side frontier filter: rules are parsed ONCE per host from
a (host, robots_txt) relation and applied as a broadcast-joined
vectorized predicate — at web scale the robots relation is tiny
(one row per host) next to the frontier.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """-> [(is_allow, pattern)] for the most specific matching group.

    Group selection per RFC 9309 §2.2.1: collect rules from every
    group whose user-agent token matches ``agent`` exactly
    (case-insensitive); if none, fall back to the ``*`` groups."""
    agent = agent.lower()
    exact: list[tuple[bool, str]] = []
    star: list[tuple[bool, str]] = []
    current: list[str] = []
    rules_of_current: list[tuple[bool, str]] | None = None
    seen_rule = True  # a UA line after rules starts a NEW group
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if seen_rule:
                current = []
                seen_rule = False
            current.append(val.lower())
            continue
        if key in ("allow", "disallow"):
            seen_rule = True
            rule = (key == "allow", val)
            if agent in current:
                exact.append(rule)
            if "*" in current:
                star.append(rule)
        # crawl-delay / sitemap etc.: ignored by the matcher
    return exact if exact else star


def _pattern_re(pattern: str) -> re.Pattern | None:
    if not pattern:
        return None  # empty Disallow == allow everything
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(p) for p in pattern.split("*"))
    return re.compile("^" + body + ("$" if anchored else ""))


@lru_cache(maxsize=4096)
def _compiled(text: str, agent: str) -> list[tuple[bool, int, re.Pattern]]:
    out = []
    for allow, pat in parse_robots(text, agent):
        rx = _pattern_re(pat)
        if rx is not None:
            out.append((allow, len(pat), rx))
    return out


def is_allowed(text: str, path: str, agent: str = "*") -> bool:
    """RFC 9309 §2.2.2: the longest matching pattern decides; ties go
    to Allow; no matching rule → allowed."""
    best_len, best_allow = -1, True
    for allow, plen, rx in _compiled(text, agent):
        if rx.match(path) and (plen > best_len
                               or (plen == best_len and allow)):
            best_len, best_allow = plen, allow
    return best_allow


_HOST_RE = r"^[a-zA-Z]+://([^/:?#]+)"
_PATH_RE = r"^[a-zA-Z]+://[^/]*(/[^#]*)?"


def robots_filter(frontier: DataFrame, robots: DataFrame,
                  url: str = "url", agent: str = "*") -> DataFrame:
    """Drop frontier urls a host's robots.txt disallows.

    ``robots``: (host, robots_txt) — one row per host, broadcast onto
    the frontier; hosts with no robots row are fully allowed (the
    fetch-404 convention).  Evaluation is an Arrow-batched pandas pass
    with per-host rule compilation cached per worker."""
    import pandas as pd

    host = F.lower(F.regexp_extract(F.col(url), _HOST_RE, 1))
    df = frontier.withColumn("_host", host).join(
        F.broadcast(robots.select(F.col("host").alias("_host"),
                                  F.col("robots_txt").alias("_robots"))),
        "_host", "left")

    out_schema = df.drop("_host", "_robots").schema

    def allowed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
            paths = pdf[url].str.extract(_PATH_RE, expand=False).fillna("/")
            keep = [
                t is None or not isinstance(t, str)
                or is_allowed(t, p if p else "/", agent)
                for t, p in zip(pdf["_robots"], paths)]
            yield pdf.loc[keep].drop(columns=["_host", "_robots"])

    return df.mapInPandas(allowed, out_schema)
