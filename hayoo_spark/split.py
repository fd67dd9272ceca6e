"""Per-section virtual-document splitting (SURVEY.md §2 T1, full).

The reference turns ONE Haddock page into one document PER DECLARATION:
it walks the page, cuts it at declaration anchors, and emits each piece
as its own ApiDocument whose uri is ``page#anchor``
(hayooIndexer/src/Hayoo/Haddock.hs:113-124 dialect dispatch, :156-454
per-declaration extraction, :493-578 uri/anchor assembly).  Every Hayoo
search result is such a declaration-level doc.

Webtext generalization implemented here: an HTML page is split at
ANCHORED HEADINGS (``<hN id="...">``) into virtual docs —

- section 0 (the preamble before the first anchored heading) keeps the
  page url and the page <title>;
- section i > 0 becomes url#anchor with the heading text as its title
  and the whole section (heading included) as its body;
- a page with no anchored headings passes through byte-identical.

Each virtual doc's html is rebuilt as a minimal page so the standard
extractor yields exactly the section text (the per-row invariant
``extract_text(html) == text`` holds for every emitted row; tested).
The Spark wrapper is an Arrow-batched mapInPandas whose interior is
pure vectorized pandas str ops — the same seam a real DOM parser would
plug into (index/builder.extract_text).
"""

from __future__ import annotations

import re

import pandas as pd

_BODY_RE = re.compile(r"<body[^>]*>(.*?)</body>", re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.DOTALL | re.IGNORECASE)
#: zero-width split point just before every anchored heading
_SEC_SPLIT_RE = re.compile(r'(?i)(?=<h[1-6][^>]*\sid=")')
_ANCHOR_RE = re.compile(r'(?i)^<h[1-6][^>]*\sid="([^"]*)"')
_HEADING_TXT_RE = re.compile(r"(?is)^<h[1-6][^>]*>(.*?)</h[1-6]>")


def split_pages_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas splitter (oracle twin AND the UDF interior).

    Input/output schema are identical (url, html, optional text, plus
    any passthrough columns); output has >= 1 row per input row.
    """
    if not len(pdf):
        return pdf
    pdf = pdf.reset_index(drop=True)
    html = pdf["html"].map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray)) else b)
    body = html.str.extract(_BODY_RE, expand=False)
    title = html.str.extract(_TITLE_RE, expand=False).fillna("")
    parts = body.str.split(_SEC_SPLIT_RE)
    # pages with no <body> or no anchored heading pass through untouched
    plain = body.isna() | (parts.str.len() <= 1)

    out = pd.DataFrame({
        "_part": parts.where(~plain, html.map(lambda h: [h])),
        "_title": title,
    }, index=pdf.index).explode("_part")
    out["_sec"] = out.groupby(level=0).cumcount()
    src = pdf.loc[out.index]
    plain_r = plain.loc[out.index].to_numpy()

    # fillna BEFORE .str ops: a batch where nothing matches leaves the
    # extract as float-NaN, and pandas .str refuses non-string dtypes
    anchor = out["_part"].str.extract(_ANCHOR_RE, expand=False)
    head_txt = (out["_part"].str.extract(_HEADING_TXT_RE, expand=False)
                .fillna("")
                .str.replace(r"<[^>]*>", " ", regex=True)
                .str.split().str.join(" "))
    is_sec = (out["_sec"] > 0) & ~plain_r
    vtitle = head_txt.where(is_sec, out["_title"]).fillna("")
    new_html = ("<html><head><title>" + vtitle
                + "</title></head><body>" + out["_part"]
                + "</body></html>")
    new_url = src["url"].where(
        ~is_sec, src["url"] + "#" + anchor.fillna(""))

    res = src.copy()
    res["url"] = new_url.to_numpy(object)
    res["html"] = [
        (h if isinstance(h, (bytes, bytearray)) else str(h).encode("utf-8"))
        if pl else n.encode("utf-8")
        for pl, h, n in zip(plain_r, src["html"], new_html)]
    if "text" in res.columns:
        # keep the per-row invariant text == extract(html) on every row
        # (vectorized extraction over the rebuilt section pages)
        from .analysis import extract_text_series
        new_text = extract_text_series(
            pd.Series(new_html.to_numpy(object)))
        res["text"] = [
            t if pl else nt
            for pl, t, nt in zip(plain_r, src["text"], new_text)]
    return res.reset_index(drop=True)


def split_virtual_docs(pages):
    """Spark wrapper: explode pages into per-section virtual docs
    (schema-preserving Arrow-batched mapInPandas)."""

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield split_pages_pdf(pdf)

    return pages.mapInPandas(gen, pages.schema)


# ------------------------------------------------- Haddock decl dialect

#: split just before each declaration item (`<div class="top">` inside
#: the interface div — Haddock.hs:215-217 getDecls)
_TOP_SPLIT_RE = re.compile(r'(?i)(?=<div\s+class="top")')
_NAME_ANCHOR_RE = re.compile(r'(?i)<a[^>]*\bname="([^"]+)"')
_ID_ANCHOR_RE = re.compile(r'(?i)<(?:a|div|p)[^>]*\bid="([^"]+)"')
_DEF_RE = re.compile(r'(?is)<a[^>]*class="def"[^>]*>(.*?)</a>')
_SRC_RE = re.compile(r'(?is)<p[^>]*class="src"[^>]*>(.*?)</p>')
_TAG_RE = re.compile(r"<[^>]*>")


#: Haddock 2.6 (table-layout) declaration rows: class "decl" after the
#: reference's topdeclToDecl rewrite (Haddock.hs:456-470); pages are
#: probed per row like prepareHaddock's 2.8-orElse-2.6 dispatch
_TR26_SPLIT_RE = re.compile(r'(?i)(?=<tr[^>]*class="(?:top)?decl")')
_TR26_ID_RE = re.compile(r'(?i)^<tr[^>]*\bid="([^"]*)"')
_TD26_DECL_RE = re.compile(r'(?is)<td[^>]*class="decl[^"]*"[^>]*>(.*?)</td>')
_TR26_PROBE = re.compile(r'(?i)<tr[^>]*class="(?:top)?decl"')
_TOP_PROBE = re.compile(r'(?i)<div\s+class="top"')


def split_decl_docs_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Declaration-item splitter with the reference's dialect dispatch
    (prepareHaddock, Haddock.hs:113-124: try 2.8, orElse 2.6, orElse
    passthrough): pages carrying 2.8's ``<div class="top">`` items take
    the 2.8 parser; table-layout pages whose declarations are
    ``<tr class="decl" id=...>`` rows take the 2.6 parser
    (mkVirtualDoc26, Haddock.hs:493-578); anything else passes through
    untouched.  Output = input schema + ``signature``, original page
    order preserved."""
    if not len(pdf):
        out = pdf.copy()
        out["signature"] = pd.Series([], dtype=object)
        return out
    pdf = pdf.reset_index(drop=True)
    html = pdf["html"].map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray)) else b)
    probe26 = (html.str.contains(_TR26_PROBE, regex=True)
               & ~html.str.contains(_TOP_PROBE, regex=True))
    if not probe26.any():
        return _split_decl28_pdf(pdf)
    work = pdf.copy()
    work["_orig"] = work.index
    outs = []
    sub28 = work[~probe26]
    if len(sub28):
        outs.append(_split_decl28_pdf(sub28.reset_index(drop=True)))
    sub26 = work[probe26]
    if len(sub26):
        outs.append(_split_decl26_pdf(sub26.reset_index(drop=True)))
    res = pd.concat(outs, ignore_index=True)
    res = res.sort_values("_orig", kind="mergesort").drop(columns="_orig")
    return res.reset_index(drop=True)


def _split_decl26_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """The 2.6 table-dialect parser (mkVirtualDoc26, Haddock.hs:493-578):
    each ``<tr class="decl" id=NAME>`` row (description rows until the
    next decl ride along) becomes a virtual doc with

    - title = the URI-unescaped ``id`` (theTitle >>> unEscapeString),
    - url = page url + ``#t:``/``#v:`` + title (theLinkPrefix: ``#t:``
      iff the signature's first word is data/type/newtype),
    - ``signature`` = the ``td class="decl"`` text after ``::``."""
    from urllib.parse import unquote

    pdf = pdf.reset_index(drop=True)
    html = pdf["html"].map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray)) else b)
    body = html.str.extract(_BODY_RE, expand=False)
    title = html.str.extract(_TITLE_RE, expand=False).fillna("")
    parts = body.str.split(_TR26_SPLIT_RE)
    plain = body.isna() | (parts.str.len() <= 1)

    out = pd.DataFrame({
        "_part": parts.where(~plain, html.map(lambda h: [h])),
        "_title": title,
    }, index=pdf.index).explode("_part")
    out["_sec"] = out.groupby(level=0).cumcount()
    src = pdf.loc[out.index]
    plain_r = plain.loc[out.index].to_numpy()
    is_sec = (out["_sec"] > 0) & ~plain_r

    import html as _html
    unesc = lambda x: unquote(x) if isinstance(x, str) else x  # noqa: E731
    hunesc = lambda x: _html.unescape(x) if isinstance(x, str) else x  # noqa: E731
    name = (out["_part"].str.extract(_TR26_ID_RE, expand=False)
            .fillna("").map(unesc))
    decl_txt = (out["_part"].str.extract(_TD26_DECL_RE, expand=False)
                .fillna("")
                .str.replace(_TAG_RE, " ", regex=True)
                .str.split().str.join(" ").map(hunesc))
    first = decl_txt.str.split().str[0].fillna("")
    prefix = first.isin(["data", "type", "newtype"]).map(
        lambda t: "#t:" if t else "#v:")
    sig = decl_txt.str.partition("::")[2].str.strip()

    vtitle = name.where(is_sec, out["_title"]).fillna("")
    new_html = ("<html><head><title>" + vtitle
                + "</title></head><body>" + out["_part"]
                + "</body></html>")
    new_url = src["url"].where(~is_sec, src["url"] + prefix + name)

    res = src.copy()
    res["url"] = new_url.to_numpy(object)
    res["html"] = [
        (h if isinstance(h, (bytes, bytearray)) else str(h).encode("utf-8"))
        if pl else n.encode("utf-8")
        for pl, h, n in zip(plain_r, src["html"], new_html)]
    if "text" in res.columns:
        from .analysis import extract_text_series
        new_text = extract_text_series(
            pd.Series(new_html.to_numpy(object)))
        res["text"] = [
            t if pl else nt
            for pl, t, nt in zip(plain_r, src["text"], new_text)]
    res["signature"] = sig.where(is_sec, "").fillna("").to_numpy(object)
    return res.reset_index(drop=True)


def _split_decl28_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """The 2.8 div-item parser
    (hayooIndexer/src/Hayoo/Haddock.hs:156-260 mkVirtualDoc28): cut the
    page at ``<div class="top">`` declaration items; each item becomes
    a virtual doc with

    - url = page url + ``#<anchor>`` (the decl's ``<a name=…>`` /
      ``id=…`` anchor, Haddock's ``#v:``/``#t:`` style),
    - title = the decl name (first ``<a class="def">`` text),
    - ``signature`` = the ``<p class="src">`` type after ``::``
      (the rawsig attribute feeding the signature contexts),

    and section 0 (module header + description) keeps the page url and
    page title with an empty signature.  A page with no declaration
    items passes through with an empty signature column.  Output =
    input schema + ``signature``."""
    if not len(pdf):
        out = pdf.copy()
        out["signature"] = pd.Series([], dtype=object)
        return out
    pdf = pdf.reset_index(drop=True)
    html = pdf["html"].map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray)) else b)
    body = html.str.extract(_BODY_RE, expand=False)
    title = html.str.extract(_TITLE_RE, expand=False).fillna("")
    parts = body.str.split(_TOP_SPLIT_RE)
    plain = body.isna() | (parts.str.len() <= 1)

    out = pd.DataFrame({
        "_part": parts.where(~plain, html.map(lambda h: [h])),
        "_title": title,
    }, index=pdf.index).explode("_part")
    out["_sec"] = out.groupby(level=0).cumcount()
    src = pdf.loc[out.index]
    plain_r = plain.loc[out.index].to_numpy()
    is_sec = (out["_sec"] > 0) & ~plain_r

    anchor = out["_part"].str.extract(_NAME_ANCHOR_RE, expand=False) \
        .fillna(out["_part"].str.extract(_ID_ANCHOR_RE, expand=False))
    import html as _html
    unesc = lambda s: _html.unescape(s) if isinstance(s, str) else s  # noqa: E731
    # fillna BEFORE .str ops: a no-match batch leaves float-NaN extracts
    def_name = (out["_part"].str.extract(_DEF_RE, expand=False)
                .fillna("")
                .str.replace(_TAG_RE, " ", regex=True)
                .str.split().str.join(" ").map(unesc))
    src_txt = (out["_part"].str.extract(_SRC_RE, expand=False)
               .fillna("")
               .str.replace(_TAG_RE, " ", regex=True)
               .str.split().str.join(" ").map(unesc))
    sig = src_txt.str.partition("::")[2].str.strip()

    vtitle = def_name.where(is_sec, out["_title"]).fillna("")
    new_html = ("<html><head><title>" + vtitle
                + "</title></head><body>" + out["_part"]
                + "</body></html>")
    new_url = src["url"].where(
        ~is_sec, src["url"] + "#" + anchor.fillna(""))

    res = src.copy()
    res["url"] = new_url.to_numpy(object)
    res["html"] = [
        (h if isinstance(h, (bytes, bytearray)) else str(h).encode("utf-8"))
        if pl else n.encode("utf-8")
        for pl, h, n in zip(plain_r, src["html"], new_html)]
    if "text" in res.columns:
        from .analysis import extract_text_series
        new_text = extract_text_series(
            pd.Series(new_html.to_numpy(object)))
        res["text"] = [
            t if pl else nt
            for pl, t, nt in zip(plain_r, src["text"], new_text)]
    res["signature"] = sig.where(is_sec, "").fillna("").to_numpy(object)
    return res.reset_index(drop=True)


def split_decl_virtual_docs(pages):
    """Spark wrapper for the Haddock declaration dialect: output schema
    is the input schema plus a ``signature`` string column, ready for
    SIGNATURE_FIELDS indexing."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(list(pages.schema.fields)
                        + [StructField("signature", StringType())])

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield split_decl_docs_pdf(pdf)

    return pages.mapInPandas(gen, schema)
