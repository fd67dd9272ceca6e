"""Structured metadata-block parsing (SURVEY.md §2 S3).

The reference indexer scans Hackage ``.cabal`` files — ``key: value``
header blocks — to pull out a package's name, version, synopsis and its
``build-depends`` list, which seeds the dependency DAG for ranking
(reference: hayooIndexer cabal scan; PackageRank edge derivation).  The
webtext analogue is the same shape: WARC/HTTP-style header blocks
attached to each page.

Everything here is pure JVM column expressions (regexp over the raw
block, no line-explode shuffle, no Python) so at 10^12 rows the parse
rides inside whole-stage codegen on the same scan that reads the text.
Continuation lines (leading whitespace, cabal's multi-line values) are
folded into the preceding key before extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: keys the indexer projects out of a cabal-style block
DEFAULT_KEYS = ("name", "version", "synopsis", "build-depends")


def _fold_continuations(col: Column) -> Column:
    """Join continuation lines (newline + indent) onto their key line
    with a single space — cabal semantics for multi-line values."""
    return F.regexp_replace(col, r"\n[ \t]+", " ")


def kv_value(col: Column, key: str) -> Column:
    """Extract the value of ``key: value`` from a header block
    (case-insensitive key match at line start, surrounding blanks
    trimmed; empty string when the key is absent)."""
    pat = r"(?im)^" + key + r"[ \t]*:[ \t]*([^\n]*)"
    return F.trim(F.regexp_extract(_fold_continuations(col), pat, 1))


def parse_meta(df: DataFrame, text_col: str = "meta",
               keys: tuple[str, ...] = DEFAULT_KEYS) -> DataFrame:
    """S3 metadata scan: project one typed column per requested key
    out of a cabal-style block column.  Hyphenated keys become
    underscore column names (``build-depends`` → ``build_depends``)."""
    cols = [F.col(c) for c in df.columns]
    cols += [kv_value(F.col(text_col), k).alias(k.replace("-", "_"))
             for k in keys]
    return df.select(*cols)


def depends_edges(df: DataFrame, text_col: str = "meta",
                  name_key: str = "name",
                  deps_key: str = "build-depends") -> DataFrame:
    """Derive the dependency edge list (src=name, dst=dep) from the
    comma-separated depends value — version constraints after the
    package token are dropped, exactly what the rank stage consumes
    (reference feeds cabal build-depends into the package DAG)."""
    parsed = parse_meta(df, text_col, (name_key, deps_key))
    deps = F.split(F.col(deps_key.replace("-", "_")), r"\s*,\s*")
    out = (parsed
           .select(F.col(name_key.replace("-", "_")).alias("src"),
                   F.explode(deps).alias("dep"))
           .select("src",
                   F.regexp_extract("dep", r"^([A-Za-z0-9._-]+)", 1)
                    .alias("dst"))
           .filter((F.col("src") != "") & (F.col("dst") != "")))
    return out.distinct()
