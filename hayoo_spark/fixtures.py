"""Deterministic synthetic `pages` corpus + reference query set.

Implements FIXTURES.md §1-2: a seeded (seed=42) Common-Crawl-shaped table
``(url string, warc_ts timestamp, html binary, text string, lang string)``
with a Zipfian vocabulary (s≈1.1) so term skew is present from day one,
plus hand-written edge docs (empty, unicode, stop-only, duplicate-url,
heavy-hitter) and a ~60-query reference query set covering every operator
of SURVEY.md §2.5.

Everything is pure pandas/pyarrow — no Spark needed — so the oracle tests
run without a JVM.  The same parquet is read by the Spark engine.
"""

from __future__ import annotations

import datetime as dt
import os

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.1

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu",
]


def make_vocab(n: int = VOCAB_SIZE) -> list[str]:
    """Deterministic vocabulary: word i = syllables of i's base-50 digits.

    Natural shared prefixes make prefix queries meaningful.
    """
    vocab = []
    for i in range(n):
        word, j = "", i
        while True:
            word = _SYLLABLES[j % len(_SYLLABLES)] + word
            j //= len(_SYLLABLES)
            if j == 0:
                break
        # ensure min length 4 & uniqueness by suffixing rank syllable
        vocab.append(word + _SYLLABLES[i % len(_SYLLABLES)])
    return vocab


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-s)
    return p / p.sum()


def make_pages(n_docs: int = 1000, seed: int = SEED) -> pd.DataFrame:
    """Generate the pages table (FIXTURES.md §1), edge docs appended."""
    rng = np.random.RandomState(seed)
    vocab = np.array(make_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    lengths = np.maximum(1, rng.lognormal(mean=4.55, sigma=0.6, size=n_docs).astype(np.int64))
    total = int(lengths.sum())
    draws = rng.choice(len(vocab), size=total, p=probs)
    langs = np.where(rng.rand(n_docs) < 0.95, "en", "de")

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    span = dt.timedelta(days=365)

    tags = np.array(["alpha", "beta", "gamma"], dtype=object)

    rows = []
    pos = 0
    for i in range(n_docs):
        words = vocab[draws[pos : pos + lengths[i]]]
        pos += lengths[i]
        text = " ".join(words)
        rows.append(_row(f"https://example{i % 7}.org/p/{i:08d}",
                         t0 + span * (i / max(1, n_docs)), text, langs[i],
                         tag=str(tags[i % 3])))

    rows.extend(_edge_rows(t0, vocab))
    return _finalize_pages(rows)


def _edge_rows(t0: dt.datetime, vocab: np.ndarray) -> list:
    """Edge docs at fixed urls (FIXTURES.md §1)."""
    t_edge = t0 + dt.timedelta(days=364)
    top = vocab[0]
    rows = []
    rows.append(_row("https://edge.org/empty", t_edge, "", "en"))
    rows.append(_row("https://edge.org/single", t_edge, "solitaryword", "en"))
    rows.append(_row("https://edge.org/unicode", t_edge, "café naïve 中文 tokens here", "en"))
    rows.append(_row("https://edge.org/stoponly", t_edge, "a b c d e 1 2 3", "en"))
    # duplicate-url row: first wins (newHayooIndexer/src/MainHoogle.hs:124-133)
    rows.append(_row("https://example0.org/p/00000000", t_edge, "duplicate shadow content", "de"))
    # heavy hitter: top Zipf term repeated 10k times (skew/salting path)
    rows.append(_row("https://edge.org/heavy", t_edge, " ".join([top] * 10_000), "en"))
    # mixed-case doc: distinct case variants for the `!` case-sensitive
    # field (the no-case tokenizer folds all three to one term)
    rows.append(_row("https://edge.org/case", t_edge,
                     "CamelCase camelcase CAMELCASE CamelCase plainword",
                     "en"))
    return rows


def _finalize_pages(rows: list) -> pd.DataFrame:
    df = pd.DataFrame(rows,
                      columns=["url", "warc_ts", "html", "text", "lang", "tag"])
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    df["warc_ts"] = (
        pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
        .astype("datetime64[us]")
    )
    # a second timestamp column (deterministic per url) for date-typed
    # index contexts: pub_ts = warc_ts minus an md5(url)-derived offset
    import hashlib
    offs = [int(hashlib.md5(u.encode()).hexdigest()[:4], 16) % 180
            for u in df["url"]]
    df["pub_ts"] = (df["warc_ts"] - pd.to_timedelta(offs, unit="D")) \
        .astype("datetime64[us]")
    return df


def make_pages_part(n_total: int, part: int, n_parts: int,
                    seed: int = SEED) -> pd.DataFrame:
    """One horizontal slice of a large pages corpus, generatable in
    parallel worker processes.

    Doc ``i``'s url/timestamp/tag are functions of its GLOBAL index, so
    the union of all parts has the same shape as ``make_pages(n_total)``
    (urls unique, timestamps spanning the year, 7 hosts, 3 tags).  The
    random draws (lengths, words, langs) use a per-part seed, so a part
    depends only on ``(n_total, part, n_parts, seed)`` — not on the
    other parts — which is what makes parallel generation possible.
    Edge docs are appended to the last part only.

    NOT byte-identical to ``make_pages(n_total)`` (different rng
    stream); used only for bench corpora above the monolithic-generation
    pain threshold, where no cached monolithic corpus exists.
    """
    step = (n_total + n_parts - 1) // n_parts
    start = part * step
    end = min(n_total, start + step)
    n_local = max(0, end - start)

    rng = np.random.RandomState(np.array([seed, part], dtype=np.uint32))
    vocab = np.array(make_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))

    lengths = np.maximum(1, rng.lognormal(mean=4.55, sigma=0.6, size=n_local).astype(np.int64))
    total = int(lengths.sum())
    draws = rng.choice(len(vocab), size=total, p=probs)
    langs = np.where(rng.rand(n_local) < 0.95, "en", "de")

    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    span = dt.timedelta(days=365)
    tags = np.array(["alpha", "beta", "gamma"], dtype=object)

    rows = []
    pos = 0
    for j in range(n_local):
        i = start + j
        words = vocab[draws[pos : pos + lengths[j]]]
        pos += lengths[j]
        text = " ".join(words)
        rows.append(_row(f"https://example{i % 7}.org/p/{i:08d}",
                         t0 + span * (i / max(1, n_total)), text,
                         langs[j], tag=str(tags[i % 3])))

    # edge docs belong to exactly one part: the last NON-EMPTY slice.
    # `end == n_total` alone would also match trailing empty parts
    # (start >= n_total when ceil-division overshoots), duplicating the
    # edge urls across parts and breaking the unique-url invariant.
    if end == n_total and start < n_total:
        rows.extend(_edge_rows(t0, vocab))
    return _finalize_pages(rows)


def _row(url: str, ts: dt.datetime, text: str, lang: str, tag: str = "alpha"):
    title = " ".join(text.split()[:3])
    html = f"<html><head><title>{title}</title></head><body><p>{text}</p></body></html>"
    return (url, ts.replace(tzinfo=None), html.encode("utf-8"), text, lang, tag)


def make_sectioned_pages(n_docs: int = 200, seed: int = SEED) -> pd.DataFrame:
    """Pages with anchored-heading sections (split.py T1 fixture): each
    page has a preamble plus 1-4 ``<h2 id="secK">`` sections, every
    section holding its own Zipf-drawn words plus a section-unique
    marker term ``only<i>x<k>`` (so per-section relevance is testable).
    Every third page has no sections (pass-through path)."""
    rng = np.random.RandomState(seed + 1)
    vocab = np.array(make_vocab(), dtype=object)
    probs = _zipf_probs(len(vocab))
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n_docs):
        url = f"https://sect.org/page/{i:06d}"
        ts = t0 + dt.timedelta(hours=i)
        intro = " ".join(vocab[rng.choice(len(vocab), size=12, p=probs)])
        if i % 3 == 2:
            text = intro
            html = (f"<html><head><title>{' '.join(intro.split()[:3])}"
                    f"</title></head><body><p>{intro}</p></body></html>")
        else:
            n_sec = 1 + rng.randint(4)
            parts = [f"<p>{intro}</p>"]
            for k in range(n_sec):
                words = " ".join(
                    vocab[rng.choice(len(vocab), size=20, p=probs)])
                head = " ".join(
                    vocab[rng.choice(len(vocab), size=2, p=probs)])
                parts.append(
                    f'<h2 id="sec{k}">{head}</h2>'
                    f"<p>{words} only{i}x{k}</p>")
            body = "".join(parts)
            text = " ".join(
                body.replace("<", " <").split())  # unused by the builder
            html = (f"<html><head><title>{' '.join(intro.split()[:3])}"
                    f"</title></head><body>{body}</body></html>")
        rows.append((url, ts, html.encode("utf-8"), text, "en", "alpha"))
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text",
                                     "lang", "tag"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"]).astype("datetime64[us]")
    df["pub_ts"] = df["warc_ts"]
    # per-row invariant: text column == the extractor's output
    from .analysis import extract_text_py
    df["text"] = [extract_text_py(h) for h in df["html"]]
    return df


def write_pages(path: str, n_docs: int = 1000, seed: int = SEED) -> str:
    """Write pages parquet to `path` (a directory); returns the file path."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, "pages.parquet")
    # small row groups keep the file splittable into Spark input tasks
    make_pages(n_docs, seed).to_parquet(out, index=False, row_group_size=4096)
    return out


def make_queries(n_docs: int = 1000) -> list[dict]:
    """The reference query set (FIXTURES.md §2): ~60 queries, every
    operator of SURVEY.md §2.5 covered.  Terms chosen by Zipf rank so
    head/mid/tail selectivities are all exercised."""
    vocab = make_vocab()
    head = vocab[:8]
    mid = vocab[100:108]
    tail = vocab[4000:4008]
    qs: list[dict] = []
    qid = 0

    def add(query: str, kind: str, k: int = 20, page: int = 0):
        nonlocal qid
        qs.append({"query_id": qid, "query": query, "kind": kind, "k": k, "page": page})
        qid += 1

    for t in head[:6] + mid[:6] + tail[:6]:
        add(t, "term")
    add(vocab[0], "term")  # the salted heavy hitter
    add("zzznosuchterm", "term")  # zero hits

    for a, b in zip(head, mid):
        add(f"{a} AND {b}", "and")
    for a, b, c in zip(head[:4], mid[:4], tail[:4]):
        add(f"{a} AND {b} AND {c}", "and")
    for a, b in zip(head[:5], tail[:5]):
        add(f"{a} OR {b}", "or")
    add(f"{mid[0]} OR {mid[1]} OR {mid[2]}", "or")
    for a, b in zip(head[:5], mid[:5]):
        add(f"{a} AND NOT {b}", "andnot")

    for p in [vocab[0][:3], vocab[0][:4], "zzz", vocab[100][:5]]:
        add(f"{p}*", "prefix")

    # phrases: actual bigrams are data-dependent; use head-term pairs
    add(f'"{head[0]} {head[1]}"', "phrase")
    add(f'"{head[1]} {head[0]}"', "phrase")
    add(f'"{mid[0]} {mid[1]}"', "phrase")
    add(f'"{head[0]} {head[0]}"', "phrase")

    add(f"lang:en AND {head[2]}", "field")
    add(f"lang:de AND {head[2]}", "field")
    add(f"lang:de AND {mid[3]}", "field")

    add(f"warc_ts:[2024-01-01 TO 2024-03-01] AND {head[0]}", "range")
    add(f"warc_ts:[2024-06-01 TO 2025-01-01] AND {head[1]}", "range")
    add(f"warc_ts:[2024-02-15 TO 2024-02-16] AND {head[0]}", "range")

    # fuzzy (~, Examples.md:34): misspelled head/mid terms
    add(f"{head[0][:-1]}x~", "fuzzy")
    add(f"{mid[0]}~", "fuzzy")
    add(f"{head[1]}~ AND {mid[1]}", "fuzzy")

    # filter-only branches under OR / AND NOT (ADVICE r1): matches can
    # live in segments holding NONE of the scoring terms' postings, and
    # zero-scoring-term boolean filter queries must still evaluate
    add(f"{tail[0]} OR lang:de", "field_mix")
    add(f"lang:de AND NOT {tail[1]}", "field_mix")
    add(f"lang:de OR {tail[2]}", "field_mix")
    add("lang:en OR lang:de", "field_mix", k=100)
    add(f"warc_ts:[2024-06-01 TO 2025-01-01] OR {tail[3]}", "field_mix")
    add(f"lang:de AND NOT lang:de", "field_mix")

    add(f"{head[0]}^2 OR {mid[0]}", "boost")
    add(f"{head[0]} OR {mid[0]}^0.1", "boost")

    add(head[0], "paged", k=20, page=1)
    add(head[0], "paged", k=20, page=3)
    add(head[1], "paged", k=10, page=2)

    add(f"{head[0]} OR {head[1]} OR {head[2]} OR {head[3]}", "or", k=100)  # near-all-docs
    return qs
