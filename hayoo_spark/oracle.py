"""Exact pure-Python BM25F oracle — the rank-identity reference.

Implements the full query surface (AST from query/parser.py) with exact
scoring over the pages table.  ~250 LoC, no Spark, deliberately naive:
tokenize per field -> dict-of-lists postings -> exact BM25F -> full
sort.  The Spark engine must reproduce its top-k url sequence exactly,
scores to 1e-6 (BASELINE.json rank-identical criterion).

Field (context) semantics mirror fields.FieldSpec — every field is its
own mini-index with its own df/dl/avgdl; an unscoped query term scores
the union of default fields; ``field:term`` scores one field; every
contribution is scaled by the field's weight (weight 0 = match-only,
the reference's filter contexts, IndexSchema.hs:119).

Determinism rules (the *tested* contract, FIXTURES.md §3):
- documents keyed by url, first occurrence wins
  (newHayooIndexer/src/MainHoogle.hs:124-133 semantics);
- doc ids assigned in url-ascending order; score accumulation in doc-id
  order; float64 end-to-end;
- ties broken by url ascending;
- BM25 k1=1.2 b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd

from .analysis import extract_text_py, extract_title_py, tokenize_py
from .index.fields import DEFAULT_FIELDS, FieldSpec
from .query import plan as P
from .query.parser import parse

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    urls: list[str]
    langs: list[str]
    warc_ts: list[pd.Timestamp]
    dl: dict  # field -> np.ndarray
    avgdl: dict  # field -> float
    n_docs: int
    postings: dict  # (field, term) -> [(doc_id, tf)] sorted
    positions: dict  # (field, term) -> doc -> token positions
    boosts: np.ndarray = None  # per-doc static weight (adWght analogue)
    weights: dict = dc_field(default_factory=lambda: {"text": 1.0})
    default_fields: tuple = ("text",)
    date_fields: tuple = ()          # declared date contexts
    dates: dict = dc_field(default_factory=dict)  # field -> [Timestamp]

    def idf(self, fld: str, term: str) -> float:
        df = len(self.postings.get((fld, term), ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(self, fld: str, term: str, doc: int, tf: int) -> float:
        """Weighted per-field BM25 contribution (BM25F-lite)."""
        denom = tf + K1 * (1.0 - B + B * self.dl[fld][doc] / self.avgdl[fld])
        base = self.idf(fld, term) * tf * (K1 + 1.0) / denom
        base *= self.weights[fld]
        return base * (self.boosts[doc] if self.boosts is not None else 1.0)


def _field_text(row, f: FieldSpec, from_html: bool) -> tuple[str, bool]:
    """(text, lowercase?) for one field of one page row."""
    if f.source == "body":
        return (extract_text_py(row["html"]) if from_html
                else row["text"]), True
    if f.source == "body_cs":
        return (extract_text_py(row["html"]) if from_html
                else row["text"]), False
    if f.source == "title":
        return extract_title_py(row["html"]), True
    if f.source == "url_terms":
        return row["url"], True
    return str(row[f.source]), True


def _field_tokens_py(row, f: FieldSpec, from_html: bool) -> list[str]:
    """Token list for one field of one page row — signature contexts
    bypass the tokenizer (terms ARE normalized signature strings; the
    same pure function the builder's pandas UDF applies)."""
    mode = getattr(f, "token_mode", "tokens")
    if mode in ("whole", "whole_cs"):
        v = str(row[f.source]).strip()
        if mode == "whole":
            v = v.lower()
        return [v] if v else []
    if f.source in ("sig_norm", "sig_subsig"):
        from .signature import index_terms
        return index_terms(row.get("signature"), f.source)
    text, lower = _field_text(row, f, from_html)
    return tokenize_py(text, lowercase=lower and mode != "tokens_cs")


def build_oracle_index(
    pages: pd.DataFrame, from_html: bool = False,
    fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
    drop_empty: bool = False,
) -> OracleIndex:
    dedup = pages.drop_duplicates(subset=["url"], keep="first")
    dedup = dedup.sort_values("url", kind="mergesort").reset_index(drop=True)
    date_specs = tuple(f for f in fields if f.ftype == "date")
    fields = tuple(f for f in fields if f.ftype != "date")
    if drop_empty:
        # boring-doc filter (A8): drop docs whose every default field is
        # empty — mirrors builder.prepare_docs(drop_empty=True)
        def _any_default_tokens(row) -> bool:
            for f in fields:
                if not f.default:
                    continue
                if _field_tokens_py(row, f, from_html):
                    return True
            return False

        keep = dedup.apply(_any_default_tokens, axis=1)
        dedup = dedup[keep].reset_index(drop=True)
    n = len(dedup)
    postings: dict = {}
    positions: dict = {}
    dl = {f.name: np.zeros(n, dtype=np.float64) for f in fields}
    for doc in range(n):
        row = dedup.iloc[doc]
        for f in fields:
            toks = _field_tokens_py(row, f, from_html)
            dl[f.name][doc] = len(toks)
            for pos, t in enumerate(toks):
                positions.setdefault((f.name, t), {}) \
                    .setdefault(doc, []).append(pos)
            for t, tf in sorted(Counter(toks).items()):
                postings.setdefault((f.name, t), []).append((doc, tf))
    boosts = (dedup["boost"].to_numpy(np.float64)
              if "boost" in dedup.columns else np.ones(n, np.float64))
    return OracleIndex(
        urls=dedup["url"].tolist(),
        langs=dedup["lang"].tolist(),
        warc_ts=list(pd.to_datetime(dedup["warc_ts"])),
        dl=dl,
        avgdl={k: (float(v.mean()) if n else 1.0) for k, v in dl.items()},
        n_docs=n,
        postings=postings,
        positions=positions,
        boosts=boosts,
        weights={f.name: float(f.weight) for f in fields},
        default_fields=tuple(f.name for f in fields if f.default),
        date_fields=tuple(f.name for f in date_specs),
        dates={f.name: list(pd.to_datetime(dedup[f.source]))
               for f in date_specs},
    )


def _fields_of(ix: OracleIndex, node_field: str) -> tuple[str, ...]:
    if node_field == P.DEFAULT_FIELD:
        return ix.default_fields
    if node_field in ix.weights:
        return (node_field,)
    return ()


def _expand_prefix(ix: OracleIndex, prefix: str, node_field: str) -> list[str]:
    acc: dict[str, int] = {}
    for (f, t), ps in ix.postings.items():
        if f in _fields_of(ix, node_field) and t.startswith(prefix):
            acc[t] = acc.get(t, 0) + len(ps)
    cands = sorted(acc, key=lambda t: (-acc[t], t))
    return cands[: P.MAX_EXPANSIONS]


def _parse_ts(s: str) -> pd.Timestamp:
    return pd.Timestamp(s)


def evaluate(ix: OracleIndex, node: P.Node) -> dict[int, float]:
    """Match set with scores: {doc_id: score}.  Filter-only nodes yield 0.0."""
    if isinstance(node, P.Term):
        flds = _fields_of(ix, node.field)
        if flds:
            out: dict[int, float] = {}
            for f in flds:
                for d, tf in ix.postings.get((f, node.term), ()):
                    out[d] = out.get(d, 0.0) + node.boost * ix.bm25(f, node.term, d, tf)
            return out
        if node.field == "lang":
            return {d: 0.0 for d in range(ix.n_docs) if ix.langs[d].lower() == node.term}
        if node.field == "url":
            return {d: 0.0 for d in range(ix.n_docs) if ix.urls[d].lower() == node.term}
        return {}
    if isinstance(node, P.Prefix):
        return evaluate(ix, P.Or(tuple(
            P.Term(t, field=node.field, boost=node.boost)
            for t in _expand_prefix(ix, node.prefix, node.field))))
    if isinstance(node, P.Fuzzy):
        acc: dict[str, int] = {}
        for (f, t), ps in ix.postings.items():
            if f in _fields_of(ix, node.field) and P.edit_distance_le1(node.term, t):
                acc[t] = acc.get(t, 0) + len(ps)
        cands = sorted(acc, key=lambda t: (-acc[t], t))
        return evaluate(ix, P.Or(tuple(
            P.Term(t, field=node.field, boost=node.boost)
            for t in cands[: P.MAX_EXPANSIONS])))
    if isinstance(node, P.Phrase):
        out: dict[int, float] = {}
        for f in _fields_of(ix, node.field):
            for d, s in _eval_phrase_field(ix, node, f).items():
                out[d] = out.get(d, 0.0) + s
        return out
    if isinstance(node, P.RangeFilter):
        if node.field in ix.date_fields:
            lo, hi = P.iso_prefix_bounds(node.lo, node.hi)
            vals = ix.dates[node.field]
        elif node.field in P.RANGE_FIELDS:
            lo, hi = _parse_ts(node.lo), _parse_ts(node.hi)
            vals = ix.warc_ts
        else:
            return {}
        return {d: 0.0 for d in range(ix.n_docs) if lo <= vals[d] < hi}
    if isinstance(node, P.And):
        if not node.children:
            return {}
        maps = [evaluate(ix, c) for c in node.children]
        docs = set(maps[0])
        for m in maps[1:]:
            docs &= set(m)
        return {d: sum(m.get(d, 0.0) for m in maps) for d in sorted(docs)}
    if isinstance(node, P.Or):
        out: dict[int, float] = {}
        for c in node.children:
            for d, s in evaluate(ix, c).items():
                out[d] = out.get(d, 0.0) + s
        return out
    if isinstance(node, P.AndNot):
        left = evaluate(ix, node.left)
        right = set(evaluate(ix, node.right))
        return {d: s for d, s in left.items() if d not in right}
    raise TypeError(f"unknown node {node!r}")


def _eval_phrase_field(ix: OracleIndex, node: P.Phrase, fld: str) -> dict[int, float]:
    if not node.terms:
        return {}
    terms = [t for t in node.terms]
    pos_maps = [ix.positions.get((fld, t), {}) for t in terms]
    docs = set(pos_maps[0])
    for m in pos_maps[1:]:
        docs &= set(m)
    out: dict[int, float] = {}
    for d in sorted(docs):
        starts = set(pos_maps[0][d])
        for i, m in enumerate(pos_maps[1:], start=1):
            starts &= {p - i for p in m[d]}
            if not starts:
                break
        if starts:
            score = 0.0
            for t in terms:
                tf = dict(ix.postings[(fld, t)]).get(d, 0)
                score += node.boost * ix.bm25(fld, t, d, tf)
            out[d] = score
    return out


def search(
    ix: OracleIndex, query: str, k: int = P.PAGE_SIZE, page: int = 0
) -> list[tuple[str, float]]:
    """Top-k (url, score), paged: offset = page*k
    (paging math per hayoo-server/src/Hayoo/App.hs:96-98)."""
    scores = evaluate(ix, parse(query))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], ix.urls[kv[0]]))
    off = page * k
    return [(ix.urls[d], s) for d, s in ranked[off : off + k]]


def autocomplete(ix: OracleIndex, prefix: str,
                 n: int = 20) -> list[tuple[str, float]]:
    """SCORED completion: default-field dictionary terms under prefix,
    score = Σ_field weight × df, desc then term (reference completions
    carry scores, hayoo-server/src/Hayoo/App.hs:101-111)."""
    acc: dict[str, float] = {}
    for (f, t), ps in ix.postings.items():
        if f in ix.default_fields and t.startswith(prefix):
            acc[t] = acc.get(t, 0.0) + ix.weights[f] * len(ps)
    cands = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return cands[:n]


def autocomplete_fields(ix: OracleIndex, prefix: str, n: int,
                        fields: tuple[str, ...]) -> list[tuple[str, float]]:
    """autocomplete over an explicit field set (twin of
    SearchEngine.autocomplete(fields=...))."""
    acc: dict[str, float] = {}
    for (f, t), ps in ix.postings.items():
        if f in fields and t.startswith(prefix):
            acc[t] = acc.get(t, 0.0) + ix.weights.get(f, 1.0) * len(ps)
    cands = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
    return cands[:n]


def autocomplete_queries(ix: OracleIndex, q: str, n: int = 20) -> list[str]:
    """Oracle twin of SearchEngine.autocomplete_queries — the
    reference's full-query completion (Common.hs:402-415)."""
    from . import signature as SIG
    from .query import parser as P_

    if SIG.is_signature_query(q):
        try:
            sig = SIG.parse_norm(q.strip().strip('"'))
        except ValueError:
            return []
        pref = SIG.pretty_signature(sig)
        return [t for t, _ in
                autocomplete_fields(ix, pref, n, ("signature",))]
    try:
        ast = P_.parse(q)
    except P_.QueryParseError:
        words = q.split()
        if not words:
            return []
        return [t for t, _ in
                autocomplete(ix, words[-1].strip('"').lower(), n)]
    leaf = P_.last_word_leaf(ast)
    if leaf is None:
        return []
    word = getattr(leaf, "term", None) or getattr(leaf, "prefix", "")
    if leaf.field != P.DEFAULT_FIELD:
        if leaf.field not in ix.weights:
            return []
        comps = [t for t, _ in
                 autocomplete_fields(ix, word, n, (leaf.field,))]
    else:
        comps = [t for t, _ in autocomplete(ix, word, n)]
    return P_.complete_queries(ast, comps)


def search_frontend(ix: OracleIndex, query: str, k: int = P.PAGE_SIZE,
                    page: int = 0) -> list[tuple[str, float]]:
    """Oracle twin of SearchEngine.search_frontend (Q9 planner)."""
    from .query.parser import parse_frontend

    scores = evaluate(ix, parse_frontend(query))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], ix.urls[kv[0]]))
    off = page * k
    return [(ix.urls[d], s) for d, s in ranked[off : off + k]]
