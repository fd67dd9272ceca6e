"""Query-string parser -> AST.

Surface modeled on the reference's query language as exercised by its
frontends (/root/reference/Examples.md:1-49; hayoo-server/src/Hayoo/
App.hs:144-200):

    word                  exact term (lowercased — no-case default,
                          App.hs:158-165)
    word*                 prefix match (qWord prefix semantics,
                          App.hs:196-200; explicit `*` here instead of
                          prefix-by-default — documented deviation)
    word~                 fuzzy match, edit distance <= 1 over the term
                          dictionary (`~` flavor, Examples.md:34)
    "w1 w2"               phrase (Examples.md:30)
    !"w1 w2"              case-sensitive phrase (Hunt QPhrase/QCase —
                          `!` marks case flavors for phrases as for
                          words; case preserved, CS twin field)
    ctx:"w1 w2"           scoped phrase (setContexts [c] . qPhrase,
                          App/Types.hs:175); ctx:!"w1 w2" scoped CS
    lang:en  url:...      field-scoped filter (Examples.md:8-12)
    warc_ts:[A TO B]      range on a date field (Examples.md:37-39)
    a AND b, a OR b       boolean (Examples.md:19-23)
    a AND NOT b           exclusion (Examples.md:23)
    a b c                 implicit AND of words (default query,
                          App.hs:156-165)
    expr^2.5              boost (SURVEY.md §2.5 Q8)
    ( ... )               grouping

Pure Python; shared by the Spark executors and the exact oracle so both
interpret exactly the same plan.
"""

from __future__ import annotations

import re

from .plan import (
    DEFAULT_FIELD,
    FILTER_FIELDS,
    RANGE_FIELDS,
    And,
    AndNot,
    Fuzzy,
    Node,
    Or,
    Phrase,
    Prefix,
    RangeFilter,
    Term,
)

_LEX = re.compile(
    r"""
    \s*(
        \( | \) |
        [^\s()^"]+:!?"[^"]*" |
        !?"[^"]*" |
        \[[^\]]*\] |
        \^[0-9.]+ |
        [^\s()^]+
    )
    """,
    re.VERBOSE,
)


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[str]:
    toks, pos = [], 0
    while pos < len(q):
        m = _LEX.match(q, pos)
        if not m:
            break
        toks.append(m.group(1))
        pos = m.end()
    return toks


def parse(q: str) -> Node:
    toks = _lex(q)
    if not toks:
        return And(())
    node, rest = _parse_or(toks)
    if rest:
        raise QueryParseError(f"trailing tokens: {rest!r} in {q!r}")
    return node


#: the reference's reduced score for subsignature matches (App.hs:185)
SIG_SUBSIG_BOOST = 0.1


def parse_frontend(q: str) -> Node:
    """The packaged frontend planner (Q9): what a search box calls.

    Reference ``parseHayooQuery`` ORs several derived queries with
    per-branch boosts — the parsed std query, the signature branches
    (scoped out per SURVEY §7), and a default AND-of-all-words fallback
    (hayoo-server/src/Hayoo/App.hs:144-200).  Here:

    - sig (App.hs:169-200): if the query parses as a type signature,
      OR of a case-sensitive PREFIX query on the ``signature`` context
      with a 0.1-boosted AND of exact subsignature words on the
      ``subsig`` context; queries without an arrow must reach
      complexity ≥ 3 to qualify (complexSignatures 3).  An arrow-marked
      query SKIPS the std branch entirely (``isSig`` guard);
    - std = parse(q); a parse error drops the branch entirely;
    - defq = AND of the raw string's whitespace words (quotes
      stripped, no-case, unboosted), added ONLY when both the sig and
      std branches are empty — exactly the reference's gating
      (App.hs:155-164 ``defq | null sigq && null stdq``);
    - result = Or of the live branches — each contributes score,
      matching Hunt's union-with-score-sum.
    """
    from .. import signature as SIG

    is_sig = SIG.is_signature_query(q)
    sigq = None
    try:
        sig = SIG.parse_norm(q.strip().strip('"'))
    except ValueError:
        sig = None
    if sig is not None and not is_sig and SIG.count_complex(sig) < 3:
        sig = None  # too simple to be meant as a signature
    if sig is not None:
        sig1 = Prefix(SIG.pretty_signature(sig), field="signature")
        subs = SIG.complex_signatures(1, SIG.sub_signatures(sig))
        if subs:
            sub_and = And(tuple(
                Term(SIG.pretty_signature(s), field="subsig",
                     boost=SIG_SUBSIG_BOOST) for s in subs))
            sigq = Or((sig1, sub_and))
        else:
            sigq = sig1

    std = None
    if not is_sig:
        try:
            std = parse(q)
        except QueryParseError:
            std = None
        if std is not None and std == And(()):
            std = None
    branches = tuple(b for b in (sigq, std) if b is not None)
    if not branches:
        # the reference's defq: only when BOTH parsers produced nothing
        # (App.hs:155-164) — AND of the whitespace words, quotes
        # stripped, plain no-case (qWordNoCase) word semantics, no
        # boost; lowercased to match the all-lowercase dictionary
        words = tuple(w.strip('"') for w in q.split())
        words = tuple(w for w in words if w)
        if words:
            return And(tuple(Term(w.lower()) for w in words))
        return And(())
    return branches[0] if len(branches) == 1 else Or(branches)


def _parse_or(toks: list[str]):
    left, toks = _parse_and(toks)
    parts = [left]
    while toks and toks[0].upper() == "OR":
        nxt, toks = _parse_and(toks[1:])
        parts.append(nxt)
    return (parts[0] if len(parts) == 1 else Or(tuple(parts))), toks


def _parse_and(toks: list[str]):
    left, toks = _parse_atom(toks)
    parts: list[Node] = [left]
    negs: list[Node] = []
    while toks:
        head = toks[0].upper()
        if head == "AND" and len(toks) > 1 and toks[1].upper() == "NOT":
            nxt, toks = _parse_atom(toks[2:])
            negs.append(nxt)
        elif head == "NOT":
            nxt, toks = _parse_atom(toks[1:])
            negs.append(nxt)
        elif head == "AND":
            nxt, toks = _parse_atom(toks[1:])
            parts.append(nxt)
        elif head in (")", "OR"):
            break
        else:  # implicit AND (default query = AND of words, App.hs:156-165)
            nxt, toks = _parse_atom(toks)
            parts.append(nxt)
    pos: Node = parts[0] if len(parts) == 1 else And(tuple(parts))
    for n in negs:
        pos = AndNot(pos, n)
    return pos, toks


def _parse_atom(toks: list[str]):
    if not toks:
        raise QueryParseError("unexpected end of query")
    t, rest = toks[0], toks[1:]
    if t == "(":
        node, rest = _parse_or(rest)
        if not rest or rest[0] != ")":
            raise QueryParseError("unbalanced parenthesis")
        rest = rest[1:]
        return _maybe_boost(node, rest)
    if t.startswith('"'):
        words = t.strip('"').lower().split()
        return _maybe_boost(Phrase(tuple(words)), rest)
    if t.startswith('!"'):
        # `!"w1 w2"` = case-sensitive phrase (Hunt's QPhrase/QCase
        # flavor — the `!` marker applies to phrases exactly as it
        # does to words): case is PRESERVED and adjacency is
        # evaluated over the case-sensitive twin field.
        from .plan import CS_FIELD
        words = t[1:].strip('"').split()
        return _maybe_boost(Phrase(tuple(words), field=CS_FIELD), rest)
    if t.startswith("!") and len(t) > 1:
        # `!word` = case-sensitive exact term (App.hs:187-200); case is
        # PRESERVED and the term targets the case-sensitive field.
        # `!Foo*` / `!Foo~` give the case-sensitive prefix (Q1) and
        # fuzzy flavors over that field's dictionary.
        from .plan import CS_FIELD
        w = t[1:]
        if w.endswith("*") and len(w) > 1:
            return _maybe_boost(Prefix(w[:-1], field=CS_FIELD), rest)
        if w.endswith("~") and len(w) > 1:
            return _maybe_boost(Fuzzy(w[:-1], field=CS_FIELD), rest)
        return _maybe_boost(Term(w, field=CS_FIELD), rest)
    if ":" in t and not t.startswith(":"):
        field, _, val = t.partition(":")
        field = field.lower()
        if not val.startswith("[") and field in RANGE_FIELDS and rest and rest[0].startswith("["):
            val = rest.pop(0)
        if val.startswith("["):
            while not val.endswith("]") and rest:
                val = val + " " + rest.pop(0)
            body = val.strip("[]")
            m = re.split(r"\s+TO\s+", body, flags=re.IGNORECASE)
            if len(m) != 2:
                raise QueryParseError(f"bad range: {val!r}")
            return _maybe_boost(RangeFilter(field, m[0].strip(), m[1].strip()), rest)
        if field in FILTER_FIELDS:
            return _maybe_boost(Term(val.lower(), field=field), rest)
        if val.startswith('"'):
            # scoped phrase (`author:"John Doe"` — the reference builds
            # these via `setContexts [c] . qPhrase`, App/Types.hs:175);
            # no-case default, adjacency within the named context
            words = val.strip('"').lower().split()
            return _maybe_boost(Phrase(tuple(words), field=field), rest)
        if val.startswith('!"'):
            # scoped case-sensitive phrase: `name:!"Data Map"` — the
            # scoped `!` targets the context's case-sensitive twin,
            # same convention as the scoped word flavors below
            words = val[1:].strip('"').split()
            return _maybe_boost(Phrase(tuple(words), field=field + "_cs"),
                                rest)
        if val.startswith("!") and len(val) > 1:
            # scoped case-sensitive flavor (`name:!mapM`): the
            # reference's contexts preserve case and the query flavor
            # picks qFullWord vs qWordNoCase (App.hs:187-200); here the
            # scoped `!` targets the context's case-sensitive twin
            # `<field>_cs` (same convention as the unscoped `!` ->
            # text_cs), composing with * and ~ like the unscoped form
            return _maybe_boost(_word_cs(val[1:], field + "_cs"), rest)
        # unknown field -> scoped text term (context scoping, Examples.md:8-12)
        return _maybe_boost(_word(val, field), rest)
    return _maybe_boost(_word(t, DEFAULT_FIELD), rest)


# --------------------------------------------------- printing / completion

def _fmt_boost(b: float) -> str:
    # the lexer accepts only [0-9.] after ^ — render boosts in plain
    # decimal so print->parse round-trips
    s = f"{b:g}"
    if "e" in s or "-" in s:
        s = f"{b:.10f}".rstrip("0").rstrip(".")
    return "^" + s


def _print_leaf(word: str, marker: str, field: str, boost: float) -> str:
    from .plan import CS_FIELD
    if field == CS_FIELD:
        s = "!" + word + marker
    elif field == DEFAULT_FIELD:
        s = word + marker
    elif field.endswith("_cs"):
        # scoped case-sensitive twin renders as the flavor it parses
        # from (`name_cs` <- `name:!w`) so print->parse round-trips
        s = f"{field[:-3]}:!{word}{marker}"
    else:
        s = f"{field}:{word}{marker}"
    return s + (_fmt_boost(boost) if boost != 1.0 else "")


def print_query(node: Node) -> str:
    """Render an AST back to surface syntax (the reference's
    ``printQuery``, used by full-query completion —
    hayooFrontend/src/Hayoo/Common.hs:402-415).  The output re-parses
    to the same AST (round-trip property tested)."""
    if isinstance(node, Term):
        return _print_leaf(node.term, "", node.field, node.boost)
    if isinstance(node, Prefix):
        return _print_leaf(node.prefix, "*", node.field, node.boost)
    if isinstance(node, Fuzzy):
        return _print_leaf(node.term, "~", node.field, node.boost)
    if isinstance(node, Phrase):
        from .plan import CS_FIELD
        s = '"' + " ".join(node.terms) + '"'
        if node.field == CS_FIELD:
            s = "!" + s
        elif node.field.endswith("_cs"):
            s = f"{node.field[:-3]}:!{s}"
        elif node.field != DEFAULT_FIELD:
            s = f"{node.field}:{s}"
        return s + (_fmt_boost(node.boost) if node.boost != 1.0 else "")
    if isinstance(node, RangeFilter):
        return f"{node.field}:[{node.lo} TO {node.hi}]"
    if isinstance(node, And):
        return " AND ".join(_print_child(c) for c in node.children)
    if isinstance(node, Or):
        return " OR ".join(_print_child(c) for c in node.children)
    if isinstance(node, AndNot):
        return (f"{_print_child(node.left)} AND NOT "
                f"{_print_child(node.right)}")
    raise TypeError(f"unprintable node {node!r}")


def _print_child(c: Node) -> str:
    # parenthesize EVERY composite child: precedence aside, the parser
    # flattens same-type nesting (a AND a AND b == one And), so only
    # explicit grouping makes print->parse structure-preserving
    if isinstance(c, (And, Or, AndNot)):
        return f"({print_query(c)})"
    return print_query(c)


def last_word_leaf(node: Node) -> Node | None:
    """The RIGHTMOST completable word leaf (Term/Prefix/Fuzzy) in query
    order — the word Hunt's completion targets."""
    if isinstance(node, (Term, Prefix, Fuzzy)):
        return node
    if isinstance(node, (And, Or)):
        for c in reversed(node.children):
            leaf = last_word_leaf(c)
            if leaf is not None:
                return leaf
        return None
    if isinstance(node, AndNot):
        return last_word_leaf(node.right) or last_word_leaf(node.left)
    return None


def _replace_last(node: Node, repl: Node):
    """-> (new_node, replaced?) — substitute the rightmost word leaf."""
    if isinstance(node, (Term, Prefix, Fuzzy)):
        return repl, True
    if isinstance(node, (And, Or)):
        kids = list(node.children)
        for i in range(len(kids) - 1, -1, -1):
            new, ok = _replace_last(kids[i], repl)
            if ok:
                kids[i] = new
                return type(node)(tuple(kids)), True
        return node, False
    if isinstance(node, AndNot):
        new, ok = _replace_last(node.right, repl)
        if ok:
            return AndNot(node.left, new), True
        new, ok = _replace_last(node.left, repl)
        if ok:
            return AndNot(new, node.right), True
        return node, False
    return node, False


def complete_queries(node: Node, completions: list[str]) -> list[str]:
    """The reference's ``completeQueries`` + ``printQuery`` pipeline
    (Common.hs:402-415 `H.printQuery <$> H.completeQueries q comps`):
    substitute each completion for the query's LAST word (the completed
    word becomes an exact term — the prefix/fuzzy marker is consumed)
    and re-render the WHOLE query string."""
    leaf = last_word_leaf(node)
    if leaf is None:
        return []
    out = []
    for comp in completions:
        new, _ = _replace_last(
            node, Term(comp, field=leaf.field, boost=leaf.boost))
        out.append(print_query(new))
    return out


def _word(w: str, field: str) -> Node:
    return _word_cs(w.lower(), field)


def _word_cs(w: str, field: str) -> Node:
    """Word -> leaf with case preserved (the `!` flavors)."""
    if w.endswith("*") and len(w) > 1:
        return Prefix(w[:-1], field=field)
    if w.endswith("~") and len(w) > 1:
        return Fuzzy(w[:-1], field=field)
    return Term(w, field=field)


def _maybe_boost(node: Node, rest: list[str]):
    if rest and rest[0].startswith("^"):
        b = float(rest[0][1:])
        rest = rest[1:]
        node = _apply_boost(node, b)
    return node, rest


def _apply_boost(node: Node, b: float) -> Node:
    if isinstance(node, Term):
        return Term(node.term, node.field, node.boost * b)
    if isinstance(node, Prefix):
        return Prefix(node.prefix, node.field, node.boost * b)
    if isinstance(node, Fuzzy):
        return Fuzzy(node.term, node.field, node.boost * b)
    if isinstance(node, Phrase):
        return Phrase(node.terms, node.field, node.boost * b)
    if isinstance(node, And):
        return And(tuple(_apply_boost(c, b) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(_apply_boost(c, b) for c in node.children))
    if isinstance(node, AndNot):
        return AndNot(_apply_boost(node.left, b), node.right)
    return node
