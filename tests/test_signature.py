"""T7–T10 signature family vs the reference's semantics
(hayooLib/src/Hayoo/ParseSignature.hs; parse table from
hayooLib/test/Parser.hs)."""

import pytest

from hayoo_spark import signature as S

V = lambda x: ("var", x)            # noqa: E731
T = lambda x: ("type", x)           # noqa: E731
APP = lambda *xs: ("app", tuple(xs))       # noqa: E731
TUP = lambda *xs: ("tuple", tuple(xs))     # noqa: E731
FUN = lambda p, r: ("fun", p, r)           # noqa: E731

# the reference's own parser test table (hayooLib/test/Parser.hs:31-48)
REFERENCE_TABLE = [
    ("a", V("a")),
    ("a b", APP(V("a"), V("b"))),
    ("[a]", APP(T("[]"), V("a"))),
    ("a -> b", FUN(V("a"), V("b"))),
    ("()", T("()")),
    ("(a)", V("a")),
    ("(a,b)", TUP(V("a"), V("b"))),
    ("( a , b )", TUP(V("a"), V("b"))),
    ("a -> b c", FUN(V("a"), APP(V("b"), V("c")))),
    ("a b -> c", FUN(APP(V("a"), V("b")), V("c"))),
    ("a -> b -> c", FUN(V("a"), FUN(V("b"), V("c")))),
    ("(a -> b) -> c", FUN(FUN(V("a"), V("b")), V("c"))),
    ("a b c", APP(V("a"), V("b"), V("c"))),
    ("a b c -> d", FUN(APP(V("a"), V("b"), V("c")), V("d"))),
    ("[a b c]", APP(T("[]"), APP(V("a"), V("b"), V("c")))),
    ("f(a)", APP(V("f"), V("a"))),
]


@pytest.mark.parametrize("text,ast", REFERENCE_TABLE,
                         ids=[t for t, _ in REFERENCE_TABLE])
def test_reference_parse_table(text, ast):
    assert S.parse_signature(text) == ast


def test_parse_context_and_constructors():
    got = S.parse_signature("Ord a => [a] -> [a]")
    assert got == ("ctx", APP(T("Ord"), V("a")),
                   FUN(APP(T("[]"), V("a")), APP(T("[]"), V("a"))))
    assert S.parse_signature("Maybe a") == APP(T("Maybe"), V("a"))
    assert S.parse_signature("a :+: b") == APP(T(":+:"), V("a"), V("b"))
    assert S.parse_signature("a `Either` b") == \
        APP(T("Either"), V("a"), V("b"))


def test_pretty_round_trip():
    for text in ["(a->b)->[a]->[b]", "Ord a=>[a]->[a]", "(a,b)->a",
                 "Maybe a->a", "forall a.a->b", "a:+:b", "m (a,b)"]:
        sig = S.parse_signature(text)
        assert S.parse_signature(S.pretty_signature(sig)) == sig


def test_normalize_first_occurrence_order():
    sig = S.parse_signature("x -> y -> x")
    norm, mapping = S.normalize_signature(sig)
    assert S.pretty_signature(norm) == "a->b->a"
    assert dict(mapping) == {"x": "a", "y": "b"}
    # type names never rename
    sig2 = S.parse_norm("Tree x -> x")
    assert S.pretty_signature(sig2) == "Tree a->a"


def test_subsignatures_map_golden():
    """Hand-derived from the reference algorithm for map's signature:
    parents drops the [] constructors, children walk nested arrows,
    complexity >= 1 drops bare variables."""
    got = S.index_terms("(a->b)->[a]->[b]", "sig_subsig")
    assert got == ["(a->b)->a->b", "a->b", "[a]->[b]", "[a]", "[]"]
    assert S.index_terms("(a->b)->[a]->[b]", "sig_norm") == \
        ["(a->b)->[a]->[b]"]


def test_subsignatures_context_unwraps():
    """Top-level Context: class constraints and the body are the subs
    (ParseSignature.hs:375-381)."""
    got = S.index_terms("(Ord k, Eq v) => k -> v -> Map k v",
                        "sig_subsig")
    assert "Ord a" in got and "Eq a" in got
    assert "a->b->Map a b" in got


def test_normalization_renames_across_variables():
    # every bare var normalizes to "a" -> dedup in subsigs
    subs = S.index_terms("x -> y", "sig_subsig")
    assert subs == []  # both subs are bare vars (complexity 0)


def test_is_signature_query():
    assert S.is_signature_query("a -> b")
    assert S.is_signature_query("Ord a => a")
    assert not S.is_signature_query("mapM filter")


def test_unparseable_yields_no_terms():
    assert S.index_terms("-> ->", "sig_norm") == []
    assert S.index_terms(None, "sig_subsig") == []
    assert S.index_terms("", "sig_norm") == []
