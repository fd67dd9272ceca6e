"""Hoogle export-file declaration parser (SURVEY.md §2 T11, full).

The reference turns Hoogle text exports into typed FunctionInfo
documents with two cooperating pieces:

- a line grammar classifying each line into a ``HoogleLine`` value —
  comment / @package / @version / module / type / newtype / data /
  function signature / multi-decl / bracket-decl / instance / class /
  dataType[..] / constr[..] / blank
  (newHayooIndexer/src/ParseHoogle.hs:16-209), and
- a sequential stateful fold carrying the current package, module,
  pending comment block, and doc-URI prefix, emitting one
  ``(name, FunctionInfo)`` per declaration with the 8-value
  ``fctType`` enum (class data function method module newtype type
  unknown — newHayooIndexer/src/Hayoo/FunctionInfo.hs:42-57) and a
  Haddock anchor URI (newHayooIndexer/src/ProcessLine.hs:17-92).

This module reimplements those *semantics* in Python: the classifier
is a hand-written port of the grammar (regexes + tiny scanners, same
alternative order as ``anyLine``), and the fold runs per file inside
``applyInPandas`` — sequential within a file exactly like the
reference's pipes pipeline (ProcessHoogle.hs:40-66), parallel across
files (a Hoogle corpus ships as thousands of per-package exports; the
reference batches 20 packages per output file, MainHoogle.hs:277-284).
Parallelism is therefore per-file on both engines, and per-file state
can never leak across tasks.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: the 8-value fctType enum (FunctionInfo.hs:42-57)
FCT_TYPES = ("class", "data", "function", "method", "module", "newtype",
             "type", "unknown")

DECL_SCHEMA = ("file string, line_no long, package string, "
               "module string, name string, fct_type string, "
               "signature string, description string, doc_uri string")

URI_PREFIX = "http://hackage.haskell.org/package/"

# --- the line grammar (ParseHoogle.hs), same alternative order -------------

# ident: letter/underscore start, word chars + ' (+ optional trailing #,
# GHC's magic-hash names); identLetter admits any char > 127 like the
# reference (ord c > 127) — Python \w with re.UNICODE covers those
_IDENT = r"[^\W\d][\w']*#?"
_OPCH = r"[:!#$%&*+./<=>?@\\^|\-~]"
# parenOp "(+)" | operator "+" | tupleOp "(,,)"
_IDENT_OR_OP = rf"(?:{_IDENT}|\({_OPCH}+\)|{_OPCH}+|\(,*\))"

_RE_COMMENT = re.compile(r"--[ \t]*(.*)$")
_RE_INSTANCE = re.compile(r"instance[ \t]*(.*)$")
_RE_CLASS = re.compile(r"class[ \t]*(.*)$")
_RE_PACKAGE = re.compile(r"@package[ \t]*(.*)$")
_RE_VERSION = re.compile(r"@version[ \t]*(.*)$")
_RE_MODULE = re.compile(r"module[ \t]*(.*)$")
_RE_TYPE = re.compile(
    rf"type[ \t]*(?P<name>{_IDENT_OR_OP})[ \t]*(?P<lhs>[^=]*)=[ \t]*(?P<sig>.*)$")
_RE_NEWTYPE = re.compile(
    rf"newtype[ \t]*(?:.*? =>[ \t]*)?(?P<name>{_IDENT_OR_OP})[ \t]*(?P<params>.*)$")
_RE_FUNCTION = re.compile(
    rf"(?P<name>{_IDENT})[ \t]*::[ \t]*(?P<sig>.*)$")
#: multiName = naked operator | ident (ParseHoogle.hs:148-160)
_MNAME = rf"(?:{_IDENT}|{_OPCH}+)"
_RE_MULTI = re.compile(
    rf"(?P<names>{_MNAME}(?:[ \t]*,[ \t]*{_MNAME})+|"
    rf"\([ \t]*{_MNAME}(?:[ \t]*,[ \t]*{_MNAME})*[ \t]*\)|{_OPCH}+)"
    r"[ \t]*::[ \t]*(?P<sig>.*)$")
_RE_BRACKET = re.compile(
    rf"\[[ \t]*{_IDENT_OR_OP}(?:[ \t]*,[ \t]*{_IDENT_OR_OP})*[ \t]*\]"
    r"[ \t]*::[ \t]*(?P<sig>.*)$")
_RE_DATATYPE = re.compile(rf"dataType\[(?P<name>{_IDENT})\][ \t]*::[ \t]*(.*)$")
_RE_CONSTR = re.compile(rf"constr\[(?P<name>{_IDENT})\][ \t]*::[ \t]*(.*)$")


def _balanced_end(s: str, i: int) -> int:
    """index just past the paren group opening at s[i], or -1."""
    depth = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def _parse_data_d1(s: str) -> str | None:
    """dataDef's d1 (ParseHoogle.hs:124-137): dataName, then dataParams
    (ident[+bracket tag] | paren group | $ident), then end-of-line or a
    ``::`` kind signature.  Anything else fails the alternative."""
    s = s.lstrip()
    m = re.match(_IDENT, s)
    if m:
        name, i = m.group(0), m.end()
    else:
        # parenOp yields the bare op, tupleOp keeps its parens
        # (ParseHoogle.hs:58-66)
        m = re.match(rf"\(({_OPCH}+)\)", s)
        if m:
            name, i = m.group(1), m.end()
        else:
            m = re.match(r"\((,*)\)", s)
            if not m:
                return None
            name, i = m.group(0), m.end()
    while True:
        while i < len(s) and s[i] in " \t":
            i += 1
        if i >= len(s):
            return name  # eof: DataDecl
        if s.startswith("::", i):
            return name  # kind signature: rest ignored
        if s[i] == "(":
            j = _balanced_end(s, i)
            if j < 0:
                return None
            i = j
            continue
        if s[i] == "$":
            m = re.match(_IDENT, s[i + 1:])
            if not m:
                return None
            i += 1 + m.end()
            continue
        m = re.match(_IDENT, s[i:])
        if not m:
            return None
        i += m.end()
        # optional [tag] suffix (ATuple20 s[am5Q] style)
        if i < len(s) and s[i] == "[":
            m = re.match(rf"\[{_IDENT}\]", s[i:])
            if not m:
                return None
            i += m.end()


def _parse_data(rest: str) -> str | None:
    """``data`` declarations: try d1, then ident-constraint ``=>`` d1,
    then paren-constraint ``=>`` d1 (ParseHoogle.hs:124-131)."""
    name = _parse_data_d1(rest)
    if name is not None:
        return name
    s = rest.lstrip()
    m = re.match(rf"(?:{_IDENT}[ \t]+)*{_IDENT}[ \t]*=>", s)
    if m:  # d2
        return _parse_data_d1(s[m.end():])
    if s.startswith("("):  # d3
        j = _balanced_end(s, 0)
        if j > 0:
            after = s[j:].lstrip()
            if after.startswith("=>"):
                return _parse_data_d1(after[2:])
    return None



def _drop_hash(name: str) -> str:
    """ident' parses a trailing magic-hash but DROPS it from the
    returned name (ParseHoogle.hs ident': returns c:cs without the
    '#'), so ``foo# :: ...`` indexes as ``foo`` with anchor #v:foo.
    Operators (``##``) and tuple ops keep theirs — they are not idents."""
    if name.endswith("#") and re.match(r"[^\W\d]", name):
        return name[:-1]
    return name


def classify_line(line: str):
    """-> (kind, payload) mirroring ``anyLine``'s alternative order
    (ParseHoogle.hs:191-207); None for a parse failure (the reference
    logs and skips those lines, ProcessHoogle.hs:62-66)."""
    s = line
    m = _RE_COMMENT.match(s)
    if m:
        return ("comment", m.group(1))
    m = _RE_INSTANCE.match(s)
    if m:
        return ("instance", m.group(1))
    m = _RE_CLASS.match(s)
    if m:
        return ("class", m.group(1))
    m = _RE_PACKAGE.match(s)
    if m:
        return ("package", m.group(1))
    m = _RE_VERSION.match(s)
    if m:
        return ("version", m.group(1))
    m = _RE_TYPE.match(s)
    if m:
        return ("type", (_drop_hash(m.group("name")), m.group("sig")))
    if s.startswith("data") and not s.startswith("dataType["):
        name = _parse_data(s[4:])
        if name is not None:
            return ("data", _drop_hash(name))
    m = _RE_MODULE.match(s)
    if m:
        return ("module", m.group(1))
    m = _RE_NEWTYPE.match(s)
    if m:
        return ("newtype", _drop_hash(m.group("name")))
    m = _RE_FUNCTION.match(s)
    if m:
        return ("function", (_drop_hash(m.group("name")), m.group("sig")))
    m = _RE_MULTI.match(s)
    if m:
        names = [n.strip() for n in
                 m.group("names").strip("()").split(",")]
        return ("multi", ([_drop_hash(n) for n in names if n], m.group("sig")))
    m = _RE_BRACKET.match(s)
    if m:
        return ("bracket", m.group("sig"))
    m = _RE_DATATYPE.match(s)
    if m:
        return ("datatype", _drop_hash(m.group("name")))
    m = _RE_CONSTR.match(s)
    if m:
        return ("constr", _drop_hash(m.group("name")))
    if not s.strip():
        return ("blank", "")
    return None


# --- the stateful fold (ProcessLine.hs) ------------------------------------

def fixup_signature(sig: str) -> str:
    """fixupSignature (ProcessLine.hs:36-44): drop strictness bangs and
    ``{- UNPACK -}`` pragmas (each pragma leaves one space) before the
    signature parser sees the string."""
    return sig.replace("{- UNPACK -}", " ").replace("!", "")


def to_uri(name: str) -> str:
    """Haddock anchor escaping (ProcessLine.hs:59-62): alnum kept,
    every other char becomes ``-<ord>-``."""
    return "".join(c if c.isalnum() else f"-{ord(c)}-" for c in name)


def _fixup_comments(comments: list[str]) -> str:
    """fixupComments (ProcessLine.hs:30-34): drop a leading ``| `` per
    line, join with unlines (trailing newline per line)."""
    out = []
    for c in comments:
        out.append(c[2:] if c.startswith("| ") else c)
    return "".join(x + "\n" for x in out)


def fold_file(file: str, lines: list[tuple[int, str]]) -> Iterator[tuple]:
    """Sequential per-file fold, the exact processLine state machine
    (ProcessLine.hs:17-92).  Lines before the first ``@package`` are
    skipped like the reference's skipToPackage (ProcessHoogle.hs:45-52;
    they may not even be well-formed UTF-8)."""
    package = module = ""
    uri_prefix = ""
    comments: list[str] = []
    started = False

    def emit(line_no, kind, name, signature, uri_suffix):
        nonlocal comments
        descr = _fixup_comments(comments)
        comments = []
        fct = kind if kind in FCT_TYPES else "unknown"
        return (file, line_no, package, module, name, fct, signature,
                descr, uri_prefix + uri_suffix)

    for line_no, text in sorted(lines):
        if not started:
            if text.startswith("@package"):
                started = True
            else:
                continue
        parsed = classify_line(text)
        if parsed is None:
            continue  # reference logs "error on line N" and skips
        kind, payload = parsed
        if kind == "comment":
            comments.append(payload)
        elif kind == "package":
            package = payload
        elif kind == "module":
            module = payload
            uri_prefix = (URI_PREFIX + package + "/docs/"
                          + module.replace(".", "-") + ".html")
            yield emit(line_no, "module", module, "", "#")
        elif kind == "type":
            name, sig = payload
            yield emit(line_no, "type", name, sig, "#t:" + to_uri(name))
        elif kind == "newtype":
            yield emit(line_no, "newtype", payload, "",
                       "#t:" + to_uri(payload))
        elif kind == "data":
            yield emit(line_no, "data", payload, "",
                       "#t:" + to_uri(payload))
        elif kind == "function":
            name, sig = payload
            yield emit(line_no, "function", name, sig,
                       "#v:" + to_uri(name))
        elif kind == "multi":
            names, sig = payload
            for name in names:
                yield emit(line_no, "function", name, sig,
                           "#v:" + to_uri(name))
        # blank/version/instance/class/bracket/datatype/constr:
        # no emission, comments NOT cleared (processLine.hs:66,81,88)


def parse_hoogle_decls(lines: DataFrame, file_col: str = "file",
                       order: str = "line_no",
                       text: str = "text") -> DataFrame:
    """(file, line_no, text) lines -> FunctionInfo declaration rows.

    One ``applyInPandas`` group per file: the fold is inherently
    sequential within a file (the @package/module state), and a file is
    the reference's own unit of work — scale comes from file count."""
    import pandas as pd

    def fold(key, pdf):
        file = key[0]
        rows = list(fold_file(
            file, list(zip(pdf[order].astype(int), pdf[text]))))
        cols = ["file", "line_no", "package", "module", "name",
                "fct_type", "signature", "description", "doc_uri"]
        return pd.DataFrame(rows, columns=cols)

    return (lines.groupBy(file_col).applyInPandas(fold, DECL_SCHEMA))


def read_hoogle_decls(spark: SparkSession, path: str) -> DataFrame:
    """Hoogle export files -> declaration rows (T11 end-to-end)."""
    from .lines import read_text_lines
    return parse_hoogle_decls(read_text_lines(spark, path))


def decls_to_pages(decls: DataFrame) -> DataFrame:
    """Adapter to the index builder's text-corpus shape with a
    ``signature`` column, feeding SIGNATURE_FIELDS (the reference path:
    FunctionInfo -> ApiDocument with signature/subsig contexts,
    FctIndexerCore.hs:30-60): url = doc_uri, body = name + description,
    signature = the declared type, bang/UNPACK-fixed like the
    reference's toSubSignatures (FctIndexerCore.hs:110-113)."""
    from pyspark.sql import functions as F
    sig = F.regexp_replace(
        F.regexp_replace("signature", r"\{- UNPACK -\}", " "), "!", "")
    return decls.select(
        F.col("doc_uri").alias("url"),
        F.concat_ws("\n", F.col("name"), F.col("description"))
        .alias("text"),
        sig.alias("signature"),
        F.col("package"), F.col("module"), F.col("fct_type"))
