"""Canonical text analysis: extraction + tokenization.

One definition of "a token", shared verbatim by three implementations
that must agree byte-for-byte (the per-row invariant in BASELINE.json):

- Spark-side JVM expressions (:func:`tokens_col`) — the hot path, pure
  ``pyspark.sql.functions`` so it stays inside whole-stage codegen;
- pure-Python (:func:`tokenize_py`) — used by the exact oracle;
- a DuckDB SQL fragment (:data:`DUCKDB_TOKENS_SQL`) — used by the
  driver-side correctness oracle.

Semantics follow the reference's default ``\\w``-class word tokenizer +
boring-word filter (drop tokens of length <= 1):
hayooIndexer/src/Hayoo/IndexConfig.hs:214-219 (boring words),
hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:103-121 (context regexes,
``\\w*`` class), lowercasing per the no-case default query path
(hayoo-server/src/Hayoo/App.hs:156-165).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# The token character class.  ASCII-word on purpose: identical meaning in
# Java regex (Spark), RE2 (DuckDB) and Python `re`.
TOKEN_RE = "[a-z0-9_]+"
TOKEN_RE_CS = "[a-zA-Z0-9_]+"  # case-sensitive flavor (no lowercasing)
MIN_TOKEN_LEN = 2

_PY_TOKEN_RE = re.compile(TOKEN_RE)
_PY_TOKEN_RE_CS = re.compile(TOKEN_RE_CS)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)

# HTML extraction: the fixture pages wrap text as
# <html><head><title>T</title></head><body><p>TEXT</p></body></html>.
# Real-corpus extraction would plug a proper parser into the same pandas
# UDF seam (see ops/multimodal.py for the stub pattern); the invariant
# checked is byte-identical `text` per `url` vs this extractor.
_TAG_RE = re.compile(r"<[^>]*>")
_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.DOTALL | re.IGNORECASE)


def extract_text_col(html: Column | str) -> Column:
    """JVM-side HTML->text extraction (whole-stage codegen, no Arrow
    round-trip): body element (fallback whole doc), tags stripped,
    whitespace collapsed.  Byte-identical to extract_text_py — verified
    by the engine-vs-oracle parity suite, which extracts from html."""
    col = F.col(html) if isinstance(html, str) else html
    doc = col.cast("string")
    # ONE body-regex pass: extract the WHOLE match (group 0) — its
    # non-emptiness IS the old rlike() test (the pattern cannot match
    # empty), and the <body>/</body> wrappers it retains are tags the
    # strip pass removes anyway, so the trimmed/collapsed output is
    # byte-identical to the old rlike + group-1 form (including the
    # `<body></body>` empty-body edge) at one fewer full-text scan of
    # the non-greedy dotall regex — ~30% of the build's extract cost.
    m0 = F.regexp_extract(doc, r"(?is)<body[^>]*>(.*?)</body>", 0)
    chosen = F.when(m0 != "", m0).otherwise(doc)
    stripped = F.regexp_replace(chosen, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def tokens_col(text: Column | str, lowercase: bool = True) -> Column:
    """Spark Column of tokens (array<string>) for a text column.

    lowercase -> extract TOKEN_RE matches -> drop tokens shorter than
    MIN_TOKEN_LEN.  Stays JVM-side (regexp_extract_all + filter).
    ``lowercase=False`` keeps original case (the `!` case-sensitive
    field flavor).
    """
    col = F.col(text) if isinstance(text, str) else text
    if lowercase:
        toks = F.regexp_extract_all(F.lower(col), F.lit(TOKEN_RE), 0)
    else:
        toks = F.regexp_extract_all(col, F.lit(TOKEN_RE_CS), 0)
    return F.filter(toks, lambda t: F.length(t) >= MIN_TOKEN_LEN)


def tokenize_py(text: str, lowercase: bool = True) -> list[str]:
    """Pure-Python tokenizer — must agree exactly with tokens_col."""
    if lowercase:
        return [t for t in _PY_TOKEN_RE.findall(text.lower())
                if len(t) >= MIN_TOKEN_LEN]
    return [t for t in _PY_TOKEN_RE_CS.findall(text)
            if len(t) >= MIN_TOKEN_LEN]


def extract_title_col(html: Column | str) -> Column:
    """JVM-side <title> extraction (whitespace collapsed); empty string
    when the document has no title element."""
    col = F.col(html) if isinstance(html, str) else html
    doc = col.cast("string")
    t = F.regexp_extract(doc, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_title_py(html: bytes | str) -> str:
    """Oracle twin of extract_title_col."""
    doc = (html.decode("utf-8", errors="replace")
           if isinstance(html, (bytes, bytearray)) else html)
    m = _TITLE_RE.search(doc)
    return " ".join(m.group(1).split()) if m else ""


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer (for applyInPandas builders)."""
    return texts.str.lower().str.findall(_PY_TOKEN_RE).map(
        lambda ts: [t for t in ts if len(t) >= MIN_TOKEN_LEN]
    )


def duckdb_tokens_sql(table: str, text_col: str = "text", key_col: str = "doc_id") -> str:
    """DuckDB CTE body producing (key, term) rows identical to tokens_col."""
    return (
        f"SELECT {key_col}, t.term FROM {table}, "
        f"UNNEST(regexp_extract_all(lower({text_col}), '{TOKEN_RE}')) AS t(term) "
        f"WHERE length(t.term) >= {MIN_TOKEN_LEN}"
    )


def extract_text_py(html: bytes) -> str:
    """Oracle HTML->text extractor (tag strip + whitespace collapse).

    Main-content rule: take the <body> element (fall back to the whole
    document), strip tags, collapse whitespace.  Mirrors the reference's
    plain-text extraction semantics (hayooIndexer/src/Hayoo/
    Haddock.hs:606-629 via naive analogue newHayooIndexer/src/
    ParseHoogle.hs:212-223: drop <...> spans).
    """
    doc = html.decode("utf-8", errors="replace")
    m = _BODY_RE.search(doc)
    txt = _TAG_RE.sub(" ", m.group(1) if m else doc)
    return " ".join(txt.split())


def extract_text_series(htmls: pd.Series) -> pd.Series:
    """Vectorized extraction for the pandas UDF (no per-row Python loop
    beyond the regex engine itself; Series.str ops are the input_hint's
    sanctioned vectorized path)."""
    s = htmls.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else b)
    body = s.str.extract(_BODY_RE, expand=False)
    s = body.where(body.notna(), s)
    return (
        s.str.replace(_TAG_RE, " ", regex=True)
        .str.split()
        .str.join(" ")
    )
