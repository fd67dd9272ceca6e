"""Type-signature parsing, normalization, and subsignature expansion
(SURVEY.md §2 T7–T10; reference hayooLib/src/Hayoo/ParseSignature.hs).

A faithful Python port of the reference SEMANTICS (not code): the same
grammar (arrows, contexts, ``~`` equivalence, tuples, lists, type
application, infix ``:`` constructors, backtick infix, ``forall``), the
same pretty-printer parenthesization, the same first-occurrence
variable renaming (a, b, …, z, aa, ab, …), and the same
parents/children expansion that produces the ``subsig`` context
(ParseSignature.hs:265-388).  AST nodes are hashable tuples:

    ("var", name) | ("type", name) | ("app", (nodes…))
    | ("tuple", (nodes…)) | ("fun", p, r) | ("ctx", c, t)
    | ("equiv", l, r) | ("ex", (vars…), t)

Deviation (documented): identifier character classes are ASCII +
underscore/prime/dot (the reference admits full Unicode letter
classes); webtext signatures in this corpus are ASCII.
"""

from __future__ import annotations

import itertools
import re
import string

__all__ = [
    "parse_signature", "parse_norm", "pretty_signature",
    "normalize_signature", "sub_signatures", "complex_signatures",
    "count_complex", "is_signature_query", "index_terms",
]


class SigParseError(ValueError):
    pass


_SYM_CHARS = set("!#$%&*+./<=>?@\\^|-~:")
_VAR_RE = re.compile(r"[a-z_][A-Za-z0-9_']*")
_TYPE_RE = re.compile(r"[A-Z][A-Za-z0-9_'.]*")


class _P:
    """Recursive-descent mirror of the parsec grammar
    (ParseSignature.hs:130-220)."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def error(self, what):
        raise SigParseError(f"{what} at {self.i} in {self.s!r}")

    def spaces(self):
        while self.i < self.n and self.s[self.i].isspace():
            self.i += 1

    def lit(self, tok: str) -> bool:
        if self.s.startswith(tok, self.i):
            self.i += len(tok)
            return True
        return False

    def rex(self, rx):
        m = rx.match(self.s, self.i)
        if not m:
            return None
        self.i = m.end()
        return m.group(0)

    # -- grammar ----------------------------------------------------
    def expr(self):
        btype = self.type_infix()
        self.spaces()
        if self.lit("->") or self.lit("→"):
            self.spaces()
            return ("fun", btype, self.expr())
        if self.lit("=>") or self.lit("⇒"):
            self.spaces()
            return ("ctx", btype, self.expr())
        if self.lit("~"):
            self.spaces()
            return ("equiv", btype, self.expr())
        return btype

    def type_infix(self):
        t1 = self.type_app()
        op = self.infix_sy()
        if op is None:
            return t1
        t2 = self.type_app()
        return ("app", (op, t1, t2))

    def infix_sy(self):
        save = self.i
        if self.i < self.n and self.s[self.i] == ":":
            j = self.i + 1
            while j < self.n and self.s[j] in _SYM_CHARS:
                j += 1
            op = self.s[self.i:j]
            self.i = j
            self.spaces()
            return ("type", op)
        if self.lit("`"):
            name = self.rex(_TYPE_RE)
            if name is not None:
                node = ("type", name)
            else:
                name = self.rex(_VAR_RE)
                if name is None:
                    self.i = save
                    return None
                node = ("var", name)
            if not self.lit("`"):
                self.i = save
                return None
            self.spaces()
            return node
        return None

    def type_app(self):
        ts = []
        while True:
            p = self.prim()
            if p is None:
                break
            ts.append(p)
        if not ts:
            self.error("primitive type expected")
        return ts[0] if len(ts) == 1 else ("app", tuple(ts))

    def prim(self):
        self.spaces()
        if self.i >= self.n:
            return None
        c = self.s[self.i]
        name = self.rex(_TYPE_RE)
        if name is not None:
            self.spaces()
            return ("type", name)
        name = self.rex(_VAR_RE)
        if name is not None:
            self.spaces()
            if name == "forall":  # reserved word -> existential
                return self.existential()
            return ("var", name)
        if c == "(":
            return self.tuple_()
        if c == "[":
            return self.list_()
        return None

    def existential(self):
        locs = []
        while True:
            v = self.rex(_VAR_RE)
            if v is None:
                break
            locs.append(("var", v))
            self.spaces()
        if not locs:
            self.error("forall needs at least one variable")
        if not self.lit("."):
            self.error("'.' expected after forall vars")
        self.spaces()
        return ("ex", tuple(locs), self.expr())

    def tuple_(self):
        assert self.lit("(")
        self.spaces()
        elems = []
        if not self.s.startswith(")", self.i):
            elems.append(self.expr())
            self.spaces()
            while self.lit(","):
                self.spaces()
                elems.append(self.expr())
                self.spaces()
        if not self.lit(")"):
            self.error("')' expected")
        self.spaces()
        if not elems:
            return ("type", "()")
        if len(elems) == 1:
            return elems[0]
        return ("tuple", tuple(elems))

    def list_(self):
        assert self.lit("[")
        self.spaces()
        e = self.expr()
        self.spaces()
        if not self.lit("]"):
            self.error("']' expected")
        self.spaces()
        return ("app", (("type", "[]"), e))


def parse_signature(s: str):
    p = _P(s)
    p.spaces()
    out = p.expr()
    p.spaces()
    if p.i != p.n:
        p.error("unconsumed input")
    return out


# ---------------- pretty printer (ParseSignature.hs:229-266) --------


def _is_infix_type(node) -> bool:
    return node[0] == "type" and node[1].startswith(":")


def _check_parens(s) -> str:
    k = s[0]
    if k in ("type", "var", "tuple"):
        return pretty_signature(s)
    if k == "app" and s[1] and s[1][0] == ("type", "[]"):
        return pretty_signature(s)
    if k == "app" and s[1] and _is_infix_type(s[1][0]):
        return pretty_signature(s)
    return "(" + pretty_signature(s) + ")"


def _check_parensf(s) -> str:
    if s[0] == "app":
        return pretty_signature(s)
    return _check_parens(s)


def pretty_signature(s) -> str:
    k = s[0]
    if k in ("type", "var"):
        return s[1]
    if k == "app":
        cs = s[1]
        if len(cs) == 2 and cs[0] == ("type", "[]"):
            return "[" + pretty_signature(cs[1]) + "]"
        if len(cs) == 3 and _is_infix_type(cs[0]):
            return (_check_parensf(cs[1]) + pretty_signature(cs[0])
                    + _check_parensf(cs[2]))
        return " ".join(_check_parens(c) for c in cs)
    if k == "tuple":
        return "(" + ",".join(pretty_signature(c) for c in s[1]) + ")"
    if k == "fun":
        return _check_parensf(s[1]) + "->" + pretty_signature(s[2])
    if k == "ctx":
        return _check_parensf(s[1]) + "=>" + pretty_signature(s[2])
    if k == "equiv":
        return pretty_signature(s[1]) + "~" + pretty_signature(s[2])
    if k == "ex":
        return ("forall " + " ".join(pretty_signature(v) for v in s[1])
                + "." + pretty_signature(s[2]))
    raise ValueError(f"bad node {s!r}")


# ---------------- variable normalization ----------------------------


def _keys():
    for c in string.ascii_lowercase:
        yield c
    for a, b in itertools.product(string.ascii_lowercase, repeat=2):
        yield a + b


def normalize_signature(s):
    """Rename var ids to a, b, … in first-traversal order (the derived
    Traversable's left-to-right walk, ParseSignature.hs:299-311).
    Returns (normalized, [(old, new)…])."""
    mapping: dict[str, str] = {}
    keys = _keys()

    def walk(n):
        k = n[0]
        if k == "var":
            new = mapping.get(n[1])
            if new is None:
                new = next(keys)
                mapping[n[1]] = new
            return ("var", new)
        if k == "type":
            return n
        if k in ("app", "tuple"):
            return (k, tuple(walk(c) for c in n[1]))
        if k in ("fun", "ctx", "equiv"):
            return (k, walk(n[1]), walk(n[2]))
        if k == "ex":
            return ("ex", tuple(walk(v) for v in n[1]), walk(n[2]))
        raise ValueError(f"bad node {n!r}")

    out = walk(s)
    return out, list(mapping.items())


def parse_norm(s: str):
    return normalize_signature(parse_signature(s))[0]


# ---------------- expansion (ParseSignature.hs:270-388) -------------


def _nub(xs):
    seen = set()
    out = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def _cx_elems(cx):
    return list(cx[1]) if cx[0] == "tuple" else [cx]


def _children_raw(s):
    k = s[0]
    if k in ("type", "var"):
        return []
    if k == "app":
        return list(s[1])
    if k == "tuple":
        e = list(s[1])
        return e + [c for x in e for c in _children_raw(x)]
    if k == "fun":
        return ([s[1], s[2]] + _children_raw(s[1]) + _children_raw(s[2]))
    if k == "ctx":
        return [s[2]] + _cx_elems(s[1]) + _children_raw(s[2])
    if k == "equiv":
        return ([s[1], s[2]] + _children_raw(s[1]) + _children_raw(s[2]))
    if k == "ex":
        return [s[2]] + _children_raw(s[2])
    raise ValueError(f"bad node {s!r}")


def children(s):
    return _nub(_children_raw(s))


def parents(s):
    k = s[0]
    if k in ("type", "var"):
        return s
    if k == "app":
        cs = s[1]
        if len(cs) == 2 and cs[1][0] in ("type", "var"):
            return cs[1]  # drop the topmost type id
        return ("app", tuple(parents(c) for c in cs))
    if k == "tuple":
        return ("tuple", tuple(parents(c) for c in s[1]))
    if k == "fun":
        return ("fun", parents(s[1]), parents(s[2]))
    if k == "ctx":
        return ("ctx", s[1], parents(s[2]))
    if k == "equiv":
        return s
    if k == "ex":
        return ("ex", s[1], parents(s[2]))
    raise ValueError(f"bad node {s!r}")


def _parents1(s):
    p = parents(s)
    return [] if p == s else [p]


def _expand(s):
    ps1 = _parents1(s)
    ps2 = [q for p in ps1 for q in _parents1(p)]
    return ps1 + ps2 + children(s)


def sub_signatures(s):
    """All normalized subsignatures (ParseSignature.hs:375-381)."""
    return _nub(normalize_signature(x)[0] for x in _subs_of(s))


def _subs_of(s):
    if s[0] == "ctx":
        return _cx_elems(s[1]) + [s[2]] + _subs_of(s[2])
    if s[0] == "equiv":
        return []
    return _expand(s)


def count_complex(s) -> int:
    k = s[0]
    if k == "var":
        return 0
    if k == "type":
        return 1
    if k == "app":
        return sum(count_complex(c) for c in s[1])
    if k == "tuple":
        return 1 + sum(count_complex(c) for c in s[1])
    if k in ("fun", "ctx", "equiv"):
        return 1 + count_complex(s[1]) + count_complex(s[2])
    if k == "ex":
        return len(s[1]) + count_complex(s[2])
    raise ValueError(f"bad node {s!r}")


def complex_signatures(c: int, sigs):
    return [s for s in sigs if count_complex(s) >= c]


# ---------------- query / index surfaces ----------------------------

_SIG_MARKS = ("->", "=>", "→", "⇒")


def is_signature_query(q: str) -> bool:
    """The frontend's signature sniff (hayoo-server App.hs sig branch):
    a query containing a function or context arrow."""
    return any(m in q for m in _SIG_MARKS)


def index_terms(sig_text, kind: str) -> list[str]:
    """Index-side terms for one document's ``signature`` column.

    kind='sig_norm' → the normalized signature (signature context;
    FctIndexerCore.hs:246-255 keeps complexity ≥ 0 = all);
    kind='sig_subsig' → normalized subsignatures of complexity ≥ 1
    (the subsig context).  Unparseable/empty → no terms."""
    if sig_text is None or not str(sig_text).strip():
        return []
    try:
        sig = parse_signature(str(sig_text))
    except SigParseError:
        return []
    norm = normalize_signature(sig)[0]
    if kind == "sig_norm":
        return [pretty_signature(norm)]
    if kind == "sig_subsig":
        return [pretty_signature(x)
                for x in complex_signatures(1, sub_signatures(norm))]
    raise ValueError(f"unknown kind {kind!r}")
