"""Property-based tests (hypothesis) for the pure layers: varbyte span
slicing, tokenizer twins, edit distance, simhash banding pigeonhole,
and parser total-ness.  No Spark — these run in milliseconds and sweep
the input space the fixed fixtures cannot."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hayoo_spark.analysis import tokenize_py, tokens_col  # noqa: F401
from hayoo_spark.index import codec
from hayoo_spark.ops.dedup import SIMHASH_BITS, simhash_band_edges
from hayoo_spark.query import plan as P
from hayoo_spark.query.parser import QueryParseError, parse


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varbyte_lengths_slice_decodable(vals):
    """Every per-value span reported by varbyte_encode_lengths decodes
    independently to its value — the invariant the per-doc position
    packing (builder combine) and block slicing (positions_for) rely on."""
    arr = np.asarray(vals, dtype=np.uint64)
    buf, lens = codec.varbyte_encode_lengths(arr)
    assert int(lens.sum()) == len(buf)
    off = 0
    for v, ln in zip(vals, lens):
        span = buf[off : off + int(ln)]
        got = codec.varbyte_decode(span)
        assert len(got) == 1 and int(got[0]) == v
        off += int(ln)
    # whole-buffer decode agrees too
    assert np.array_equal(codec.varbyte_decode(buf), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=300, unique=True))
def test_delta_roundtrip(ids):
    a = np.sort(np.asarray(ids, dtype=np.uint64))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(a)), a)


@given(st.text(max_size=200))
def test_tokenizer_invariants(text):
    toks = tokenize_py(text)
    assert all(len(t) >= 2 for t in toks)
    assert all(t == t.lower() for t in toks)
    # idempotent: tokenizing the joined tokens yields the same stream
    assert tokenize_py(" ".join(toks)) == toks
    # case-sensitive flavor lowercases to a superset stream
    cs = tokenize_py(text, lowercase=False)
    assert [t.lower() for t in cs if len(t.lower()) >= 2] \
        == [t for t in tokenize_py(" ".join(cs))]


def _levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


@given(st.text(alphabet="abcx", max_size=8), st.text(alphabet="abcx", max_size=8))
def test_edit_distance_le1_matches_dp(a, b):
    assert P.edit_distance_le1(a, b) == (_levenshtein(a, b) <= 1)


@given(st.integers(min_value=0, max_value=2**SIMHASH_BITS - 1),
       st.integers(min_value=0, max_value=2**SIMHASH_BITS - 1),
       st.integers(min_value=0, max_value=8))
@settings(max_examples=200)
def test_simhash_banding_pigeonhole(sig_a, sig_b, max_hamming):
    """If hamming(a,b) <= d then at least one of the d+1 bands is
    identical (candidate recall is exact) — the contract simhash_pairs
    claims."""
    ham = bin(sig_a ^ sig_b).count("1")
    edges = simhash_band_edges(max_hamming)
    shares = any(
        (sig_a >> edges[i]) & ((1 << (edges[i + 1] - edges[i])) - 1)
        == (sig_b >> edges[i]) & ((1 << (edges[i + 1] - edges[i])) - 1)
        for i in range(max_hamming + 1))
    if ham <= max_hamming:
        assert shares


@given(st.text(alphabet="ab c:()*~!^12\"[]TOANDRD", max_size=40))
def test_parser_total(q):
    """The parser either returns a plan or raises QueryParseError —
    never crashes with anything else; parseable plans are well-formed."""
    try:
        node = parse(q)
    except QueryParseError:
        return
    except ValueError:
        return  # boost parse ("^abc") raises ValueError subclass paths
    assert isinstance(node, P.Node)
    # scoring_terms never crashes on a valid plan
    P.scoring_terms(node)


# --- print_query round-trip (full-query completion's rendering) ---------

_word = st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True)
_field = st.sampled_from(["text", "title", "body2"])
_boost = st.sampled_from([1.0, 0.5, 2.0, 0.1, 3.25])


def _leaves():
    return st.one_of(
        st.builds(P.Term, term=_word, field=_field, boost=_boost),
        st.builds(P.Prefix, prefix=_word, field=_field, boost=_boost),
        st.builds(P.Fuzzy, term=_word, field=_field, boost=_boost),
        st.builds(lambda ws, b: P.Phrase(tuple(ws), boost=b),
                  st.lists(_word, min_size=1, max_size=4), _boost),
        st.builds(lambda lo, hi: P.RangeFilter("warc_ts", lo, hi),
                  st.sampled_from(["2024-01-01", "2024-03"]),
                  st.sampled_from(["2024-06-01", "2025"])),
    )


def _asts():
    return st.recursive(
        _leaves(),
        lambda kids: st.one_of(
            st.builds(lambda cs: P.And(tuple(cs)),
                      st.lists(kids, min_size=2, max_size=3)),
            st.builds(lambda cs: P.Or(tuple(cs)),
                      st.lists(kids, min_size=2, max_size=3)),
            st.builds(P.AndNot, kids, kids),
        ),
        max_leaves=8,
    )


@settings(max_examples=300, deadline=None)
@given(_asts())
def test_print_query_roundtrips(ast):
    """parse(print_query(ast)) == ast for every printable AST — the
    invariant full-query completion's re-rendering relies on
    (parser.print_query / complete_queries)."""
    from hayoo_spark.query.parser import print_query

    assert parse(print_query(ast)) == ast
