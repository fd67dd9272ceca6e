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


def frontier(links: DataFrame, url: str = "url",
             allow_host_re: str = r"\.org",
             deny_ext: tuple[str, ...] = DENY_EXT) -> DataFrame:
    """Filter + rewrite + dedup: the canonical frontier relation."""
    return (links
            .filter(frontier_filter_col(url, allow_host_re, deny_ext))
            .withColumn(url, normalize_url_col(url))
            .dropDuplicates([url]))
