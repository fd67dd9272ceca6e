"""Exact pure-Python BM25 oracle — the rank-identity reference.

Implements the full query surface (AST from query/parser.py) with exact
scoring over the pages table.  ~200 LoC, no Spark, deliberately naive:
tokenize -> dict-of-lists postings -> exact BM25 -> full sort.  The Spark
engine must reproduce its top-k url sequence exactly, scores to 1e-6
(BASELINE.json rank-identical criterion).

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
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .analysis import extract_text_py, tokenize_py
from .query import plan as P
from .query.parser import parse

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    urls: list[str]
    langs: list[str]
    warc_ts: list[pd.Timestamp]
    dl: np.ndarray
    avgdl: float
    n_docs: int
    postings: dict[str, list[tuple[int, int]]]  # term -> [(doc_id, tf)] sorted
    positions: dict[str, dict[int, list[int]]]  # term -> doc -> token positions
    boosts: np.ndarray = None  # per-doc static weight (adWght analogue)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(self, term: str, doc: int, tf: int) -> float:
        denom = tf + K1 * (1.0 - B + B * self.dl[doc] / self.avgdl)
        base = self.idf(term) * tf * (K1 + 1.0) / denom
        return base * (self.boosts[doc] if self.boosts is not None else 1.0)


def build_oracle_index(pages: pd.DataFrame, from_html: bool = False) -> OracleIndex:
    dedup = pages.drop_duplicates(subset=["url"], keep="first")
    dedup = dedup.sort_values("url", kind="mergesort").reset_index(drop=True)
    texts = (
        dedup["html"].map(extract_text_py) if from_html else dedup["text"].tolist()
    )
    postings: dict[str, list[tuple[int, int]]] = {}
    positions: dict[str, dict[int, list[int]]] = {}
    dl = np.zeros(len(dedup), dtype=np.float64)
    for doc, text in enumerate(texts):
        toks = tokenize_py(text)
        dl[doc] = len(toks)
        for pos, t in enumerate(toks):
            positions.setdefault(t, {}).setdefault(doc, []).append(pos)
        for t, tf in sorted(Counter(toks).items()):
            postings.setdefault(t, []).append((doc, tf))
    n = len(dedup)
    boosts = (dedup["boost"].to_numpy(np.float64)
              if "boost" in dedup.columns else np.ones(n, np.float64))
    return OracleIndex(
        urls=dedup["url"].tolist(),
        langs=dedup["lang"].tolist(),
        warc_ts=list(pd.to_datetime(dedup["warc_ts"])),
        dl=dl,
        avgdl=float(dl.mean()) if n else 1.0,
        n_docs=n,
        postings=postings,
        positions=positions,
        boosts=boosts,
    )


def _expand_prefix(ix: OracleIndex, prefix: str) -> list[str]:
    cands = [t for t in ix.postings if t.startswith(prefix)]
    cands.sort(key=lambda t: (-len(ix.postings[t]), t))
    return cands[: P.MAX_EXPANSIONS]


def _parse_ts(s: str) -> pd.Timestamp:
    return pd.Timestamp(s)


def evaluate(ix: OracleIndex, node: P.Node) -> dict[int, float]:
    """Match set with scores: {doc_id: score}.  Filter-only nodes yield 0.0."""
    if isinstance(node, P.Term):
        if node.field == P.DEFAULT_FIELD:
            return {d: node.boost * ix.bm25(node.term, d, tf)
                    for d, tf in ix.postings.get(node.term, ())}
        if node.field == "lang":
            return {d: 0.0 for d in range(ix.n_docs) if ix.langs[d].lower() == node.term}
        if node.field == "url":
            return {d: 0.0 for d in range(ix.n_docs) if ix.urls[d].lower() == node.term}
        return {}
    if isinstance(node, P.Prefix):
        return evaluate(ix, P.Or(tuple(
            P.Term(t, boost=node.boost) for t in _expand_prefix(ix, node.prefix))))
    if isinstance(node, P.Fuzzy):
        cands = [t for t in ix.postings if P.edit_distance_le1(node.term, t)]
        cands.sort(key=lambda t: (-len(ix.postings[t]), t))
        return evaluate(ix, P.Or(tuple(
            P.Term(t, boost=node.boost) for t in cands[: P.MAX_EXPANSIONS])))
    if isinstance(node, P.Phrase):
        return _eval_phrase(ix, node)
    if isinstance(node, P.RangeFilter):
        lo, hi = _parse_ts(node.lo), _parse_ts(node.hi)
        return {d: 0.0 for d in range(ix.n_docs) if lo <= ix.warc_ts[d] < hi}
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


def _eval_phrase(ix: OracleIndex, node: P.Phrase) -> dict[int, float]:
    if not node.terms:
        return {}
    terms = [t for t in node.terms]
    pos_maps = [ix.positions.get(t, {}) for t in terms]
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
                tf = dict(ix.postings[t]).get(d, 0)
                score += node.boost * ix.bm25(t, d, tf)
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


def autocomplete(ix: OracleIndex, prefix: str, n: int = 20) -> list[tuple[str, int]]:
    """Completion: dictionary terms under prefix, by df desc then term
    (reference: `complete` endpoint, hayoo-server/src/Hayoo/App.hs:101-111)."""
    cands = [(t, len(ps)) for t, ps in ix.postings.items() if t.startswith(prefix)]
    cands.sort(key=lambda kv: (-kv[1], kv[0]))
    return cands[:n]
