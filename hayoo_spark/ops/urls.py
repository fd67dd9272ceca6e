"""URI frontier operators (SURVEY.md §2 S6/S7).

The reference crawler keeps its frontier clean with two pure URI
transforms: a predicate deciding which links enter the frontier
(allowed scheme/host, no binary-asset extensions — hayooCrawler's
URIConfig allow/deny lists) and a rewrite normalizing each URI to a
canonical key (strip fragments and tracking noise) so the frontier
dedups correctly.  Both are pure JVM expressions here — at 10^12 link
rows these run inside whole-stage codegen with zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: extensions that never enter a text-crawl frontier
DENY_EXT = ("jpg", "jpeg", "png", "gif", "css", "js", "ico", "svg",
            "zip", "gz", "pdf", "mp4", "mp3")


def normalize_url_col(url: Column | str) -> Column:
    """S7 canonical rewrite: strip the fragment, strip a tracking-only
    query string (?utm_...), lowercase scheme://host (path kept
    case-sensitive), drop any trailing slash (the canonical root is
    ``scheme://host`` with no slash).

    Every rule is a single-pass RE2-safe regex (no lookaround) so the
    DuckDB oracle twin applies literally the same patterns."""
    col = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(col, r"#.*$", "")            # fragment
    c = F.regexp_replace(c, r"\?utm_.*$", "")         # tracking query
    c = F.concat(F.lower(F.regexp_extract(c, r"^([^/]*//[^/]*)", 1)),
                 F.regexp_replace(c, r"^[^/]*//[^/]*", ""))
    return F.regexp_replace(c, r"([^/])/$", r"$1")    # trailing slash


def frontier_filter_col(url: Column | str,
                        allow_host_re: str = r"\.org",
                        deny_ext: tuple[str, ...] = DENY_EXT) -> Column:
    """S6 frontier predicate: http(s) scheme, host matching the allow
    pattern, path not ending in a denied asset extension."""
    col = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z]+://([^/:?#]+)", 1))
    scheme_ok = col.rlike(r"^(?i)https?://")
    host_ok = host.rlike(allow_host_re)
    ext_re = r"(?i)\.(" + "|".join(deny_ext) + r")([?#].*)?$"
    return scheme_ok & host_ok & ~col.rlike(ext_re)


def url_quality_filter(docs: DataFrame, url: str = "url",
                       key: str = "doc_id", *,
                       blocked_hosts: tuple[str, ...] = (),
                       blocked_patterns: tuple[str, ...] = (),
                       allowed_schemes: tuple[str, ...] = ("http", "https"),
                       max_url_len: int = 2048,
                       max_depth: int = 8) -> DataFrame:
    """Document-level URL rule filter with TYPED verdicts — the
    C4/RefinedWeb-style corpus gate (distinct from the crawl-frontier
    predicate S6: this one labels every doc with the first failing
    rule so the drop ledger is auditable).

    Rules, in precedence order (the reason records the FIRST failure):
    scheme allowlist -> host blocklist (exact, case-insensitive) ->
    URL substring/regex blocklist -> length cap -> path-depth cap.

    Every rule is a single regexp/length expression shared verbatim
    with the DuckDB oracle (no parse_url, which DuckDB lacks) — one
    codegen'd projection over the scan, no shuffle, no UDF."""
    col = F.col(url)
    scheme = F.lower(F.regexp_extract(col, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
    # path depth = '/' count after the authority, query/fragment excluded
    path = F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    depth = F.length(path) - F.length(F.regexp_replace(path, "/", ""))
    reason = F.when(~scheme.isin(*[s.lower() for s in allowed_schemes]),
                    F.lit("scheme"))
    if blocked_hosts:
        reason = reason.when(
            host.isin(*[h.lower() for h in blocked_hosts]), F.lit("host"))
    for i, pat in enumerate(blocked_patterns):
        reason = reason.when(col.rlike(pat), F.lit(f"pattern{i}"))
    reason = (reason
              .when(F.length(col) > max_url_len, F.lit("too_long"))
              .when(depth > max_depth, F.lit("too_deep"))
              .otherwise(F.lit("keep")))
    return docs.select(key, col.alias("url"), host.alias("host"),
                       reason.alias("reason"),
                       (reason == "keep").cast("int").alias("kept"))


def frontier(links: DataFrame, url: str = "url",
             allow_host_re: str = r"\.org",
             deny_ext: tuple[str, ...] = DENY_EXT) -> DataFrame:
    """Filter + rewrite + dedup: the canonical frontier relation."""
    return (links
            .filter(frontier_filter_col(url, allow_host_re, deny_ext))
            .withColumn(url, normalize_url_col(url))
            .dropDuplicates([url]))
