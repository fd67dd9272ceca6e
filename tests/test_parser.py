"""Parser tests: query surface per /root/reference/Examples.md semantics."""

import pytest

from hayoo_spark.query import plan as P
from hayoo_spark.query.parser import QueryParseError, parse


def test_single_term():
    assert parse("Spark") == P.Term("spark")


def test_implicit_and():
    assert parse("fast join") == P.And((P.Term("fast"), P.Term("join")))


def test_explicit_bool():
    assert parse("a1 AND b2 OR c3") == P.Or(
        (P.And((P.Term("a1"), P.Term("b2"))), P.Term("c3")))


def test_and_not():
    n = parse("alpha AND NOT beta")
    assert n == P.AndNot(P.Term("alpha"), P.Term("beta"))


def test_phrase():
    assert parse('"big data join"') == P.Phrase(("big", "data", "join"))


def test_prefix():
    assert parse("spar*") == P.Prefix("spar")


def test_fuzzy():
    assert parse("spark~") == P.Fuzzy("spark")
    assert parse("spark~^2") == P.Fuzzy("spark", boost=2.0)


def test_edit_distance_le1():
    cases = [("abc", "abc", True), ("abc", "abd", True), ("abc", "ab", True),
             ("abc", "abcd", True), ("abc", "xbcd", False), ("abc", "adc", True),
             ("abc", "cba", False), ("", "a", True), ("ab", "ba", False)]
    for a, b, want in cases:
        assert P.edit_distance_le1(a, b) == want, (a, b)
        assert P.edit_distance_le1(b, a) == want, (b, a)


def test_field_filter():
    assert parse("lang:EN") == P.Term("en", field="lang")


def test_range():
    n = parse("warc_ts:[2024-01-01 TO 2024-03-01]")
    assert n == P.RangeFilter("warc_ts", "2024-01-01", "2024-03-01")


def test_boost():
    n = parse("spark^2.5")
    assert n == P.Term("spark", boost=2.5)


def test_grouping_with_boost():
    n = parse("(alpha OR beta)^2")
    assert n == P.Or((P.Term("alpha", boost=2.0), P.Term("beta", boost=2.0)))


def test_compound():
    n = parse('lang:en AND (fast OR slow*) AND NOT "bad phrase"')
    assert isinstance(n, P.AndNot)
    assert n.right == P.Phrase(("bad", "phrase"))


def test_unbalanced_paren():
    with pytest.raises(QueryParseError):
        parse("(a AND b")


def test_empty():
    assert parse("") == P.And(())


def test_scoped_case_sensitive_flavors():
    """`field:!word` composes the scope with the `!` case flavor
    (reference in-context case sensitivity, App.hs:187-200): targets
    the `<field>_cs` twin with case preserved, `*`/`~` compose."""
    assert parse("name:!MapM") == P.Term("MapM", field="name_cs")
    assert parse("name:!fooB*") == P.Prefix("fooB", field="name_cs")
    assert parse("name:!MapM~") == P.Fuzzy("MapM", field="name_cs")
    assert parse("name:!MapM^2") == P.Term("MapM", field="name_cs", boost=2.0)
    # the unscoped `!` still targets the default CS twin
    from hayoo_spark.query.plan import CS_FIELD
    assert parse("text:!MapM") == P.Term("MapM", field=CS_FIELD)
    # plain scoped words stay no-case
    assert parse("name:MapM") == P.Term("mapm", field="name")


def test_phrase_case_and_scope_flavors():
    """Phrases take the same case/scope flavors as words (Hunt QPhrase
    QCase; scoped phrases per setContexts [c] . qPhrase)."""
    from hayoo_spark.query.plan import CS_FIELD
    assert parse('!"Foo Bar"') == P.Phrase(("Foo", "Bar"), field=CS_FIELD)
    assert parse('name:"John Doe"') == P.Phrase(("john", "doe"),
                                                field="name")
    assert parse('name:!"Data Map"') == P.Phrase(("Data", "Map"),
                                                 field="name_cs")
    assert parse('!"Foo Bar"^2') == P.Phrase(("Foo", "Bar"),
                                             field=CS_FIELD, boost=2.0)
    # composes under booleans
    got = parse('!"Foo Bar" AND name:"john doe"')
    assert got == P.And((P.Phrase(("Foo", "Bar"), field=CS_FIELD),
                         P.Phrase(("john", "doe"), field="name")))


def test_scoped_case_sensitive_print_roundtrip():
    from hayoo_spark.query.parser import print_query
    for q in ("name:!MapM", "name:!fooB*", "name:!MapM~", "!MapM",
              "name:!MapM^2.5", "name:!a AND !B OR x:!C*",
              '!"Foo Bar"', 'name:"john doe"', 'name:!"Data Map"^2',
              '!"Foo Bar" AND NOT name:"john doe"'):
        ast = parse(q)
        assert parse(print_query(ast)) == ast, q
