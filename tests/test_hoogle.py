"""T11 full: the hoogle declaration grammar + stateful fold
(newHayooIndexer/src/ParseHoogle.hs:16-209, ProcessLine.hs:17-92,
ProcessHoogle.hs:40-66) and the end-to-end export -> signature-search
path."""

import pytest

from hayoo_spark.sources import hoogle as H

EXPORT = """\
preamble junk before the package marker
-- Hoogle documentation, also preamble
@package acme
@version 1.2.3
module Acme.Data.List
-- | Apply a function to every element.
-- second line
map :: (a -> b) -> [a] -> [b]
data Scenario
data Lit s
data SatResult :: *
data (Ord a, Eq a) => Tree a
newtype Identity a
type Flip f a b = f b a
(alpha, beta) :: Int -> Int
(<*>) :: f (a -> b) -> f a -> f b
instance Eq Scenario
class Functor f
-- standalone comment
filterM :: (a -> m Bool) -> [a] -> m [a]
"""


# --- line grammar ----------------------------------------------------------

@pytest.mark.parametrize("line,kind,payload", [
    ("-- | doc", "comment", "| doc"),
    ("--", "comment", ""),
    ("@package acme", "package", "acme"),
    ("@version 1.0", "version", "1.0"),
    ("module A.B", "module", "A.B"),
    ("instance Eq a => Eq [a]", "instance", "Eq a => Eq [a]"),
    ("class Monad m where", "class", "Monad m where"),
    ("type Flip f a b = f b a", "type", ("Flip", "f b a")),
    ("newtype Identity a", "newtype", "Identity"),
    ("newtype Monad m => T m a", "newtype", "T"),
    ("map :: (a -> b) -> [a] -> [b]", "function",
     ("map", "(a -> b) -> [a] -> [b]")),
    ("(a, b) :: Int", "multi", (["a", "b"], "Int")),
    ("a, b :: Int", "multi", (["a", "b"], "Int")),
    ("(<*>) :: f (a -> b) -> f a -> f b", "multi",
     (["<*>"], "f (a -> b) -> f a -> f b")),
    ("[x, y] :: T", "bracket", "T"),
    ("dataType[tree] :: DataType", "datatype", "tree"),
    ("constr[leaf] :: Constr", "constr", "leaf"),
    ("   ", "blank", ""),
])
def test_classify_line(line, kind, payload):
    assert H.classify_line(line) == (kind, payload)


@pytest.mark.parametrize("line,name", [
    # the reference grammar's own examples (ParseHoogle.hs:115-123)
    ("data Scenario", "Scenario"),
    ("data Lit s", "Lit"),
    ("data AbList a b", "AbList"),
    ("data SatResult :: *", "SatResult"),
    ("data Network (l :: * -> *) (g :: * -> *) :: (* -> *) -> (* -> *) -> *",
     "Network"),
    ("data (:=:) a b", ":=:"),
    ("data ATuple20 s[am5Q] a[am5R]", "ATuple20"),
    ("data DebuggerM (m :: * -> *) (past :: [*]) (current :: *) (future :: [*])",
     "DebuggerM"),
    ("data Eq a => Set a", "Set"),
    ("data (Ord a, Eq a) => Tree a", "Tree"),
])
def test_data_decl_examples(line, name):
    assert H.classify_line(line) == ("data", name)


def test_data_with_equals_body_is_not_a_decl():
    # "data Foo = Bar" fails every alternative in the grammar (d1 needs
    # eof or a kind signature after the params) -> skipped line
    assert H.classify_line("data Foo = Bar") is None


def test_to_uri_escaping():
    # ProcessLine.hs:59-62: alnum kept, others -<ord>-
    assert H.to_uri("map") == "map"
    assert H.to_uri("<*>") == "-60--42--62-"
    assert H.to_uri("a'") == "a-39-"


# --- stateful fold ---------------------------------------------------------

def _fold(text):
    lines = list(enumerate(text.splitlines()))
    return list(H.fold_file("f", lines))


def test_fold_emissions_and_state():
    rows = _fold(EXPORT)
    by_name = {}
    for (_f, _ln, pkg, mod, name, fct, sig, descr, uri) in rows:
        assert pkg == "acme"
        by_name.setdefault(name, []).append((mod, fct, sig, descr, uri))

    prefix = ("http://hackage.haskell.org/package/acme/docs/"
              "Acme-Data-List.html")
    # module emission: before any comment, uri suffix "#"
    assert by_name["Acme.Data.List"] == [
        ("Acme.Data.List", "module", "", "", prefix + "#")]
    # comment block attaches to the next decl, "| " dropped, unlines'd
    assert by_name["map"] == [(
        "Acme.Data.List", "function", "(a -> b) -> [a] -> [b]",
        "Apply a function to every element.\nsecond line\n",
        prefix + "#v:map")]
    # data/newtype/type kinds with #t: anchors
    assert by_name["Scenario"][0][1] == "data"
    assert by_name["Tree"][0][1] == "data"
    assert by_name["Identity"][0][1] == "newtype"
    assert by_name["Flip"] == [
        ("Acme.Data.List", "type", "f b a", "", prefix + "#t:Flip")]
    # multi-decl: one function row per name, operator uri-escaped
    assert by_name["alpha"][0][2] == "Int -> Int"
    assert by_name["beta"][0][2] == "Int -> Int"
    assert by_name["<*>"][0][4] == prefix + "#v:-60--42--62-"
    # instance/class lines emit nothing
    assert "Functor" not in by_name
    # comment before filterM survives the non-clearing class line
    assert by_name["filterM"][0][3] == "standalone comment\n"
    # every fct_type is in the 8-value enum
    assert {r[5] for r in rows} <= set(H.FCT_TYPES)


def test_fold_skips_preamble_before_package():
    rows = _fold("junk :: Int -> Int\n@package p\nf :: A -> B\n")
    assert [r[4] for r in rows] == ["f"]
    assert rows[0][2] == "p"


def test_fixup_signature():
    assert H.fixup_signature("!Int -> {- UNPACK -}Word") == "Int ->  Word"


# --- Spark integration -----------------------------------------------------

def test_parse_hoogle_decls_matches_pure_fold(spark, tmp_path):
    """Distributed fold == sequential fold, file state isolated."""
    (tmp_path / "acme.txt").write_text(EXPORT)
    (tmp_path / "beta.txt").write_text(
        "@package beta\nmodule B\nrunB :: B -> IO ()\n")
    got = H.read_hoogle_decls(spark, str(tmp_path)).collect()
    want = []
    for f in ("acme.txt", "beta.txt"):
        lines = list(enumerate((tmp_path / f).read_text().splitlines()))
        want += [r[1:] for r in H.fold_file(str(f), lines)]
    got_t = sorted(tuple(r)[1:] for r in got)
    assert got_t == sorted(want)
    # state never leaks across files
    by_pkg = {r["package"] for r in got}
    assert by_pkg == {"acme", "beta"}
    beta = [r for r in got if r["package"] == "beta"]
    assert all(r["module"] == "B" for r in beta)


def test_hoogle_export_to_signature_search(spark, tmp_path):
    """Raw export text -> typed decls -> SIGNATURE_FIELDS index -> a
    ranked signature query finds the declaration (the reference's full
    hoogle pipeline: ProcessHoogle -> FctIndexerCore -> Hunt)."""
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.fields import SIGNATURE_FIELDS
    from hayoo_spark.query.engine import SearchEngine

    (tmp_path / "acme.txt").write_text(EXPORT)
    decls = H.read_hoogle_decls(spark, str(tmp_path))
    pages = H.decls_to_pages(decls)
    src = str(tmp_path / "pages.parquet")
    pages.write.parquet(src)
    ix = str(tmp_path / "ix")
    build_index(spark, src, ix, n_segments=2, fields=SIGNATURE_FIELDS)
    eng = SearchEngine(spark, ix)
    for mode in ("local", "spark"):
        hits = eng.search_frontend("(a -> b) -> [a] -> [b]", k=5,
                                   mode=mode)
        assert hits, mode
        top = hits[0][0]
        assert top.endswith("#v:map"), (mode, hits)


def test_magic_hash_dropped_from_ident_names():
    """ident' parses the trailing '#' but drops it (ParseHoogle.hs),
    so GHC magic-hash names index clean and the Haddock anchor is
    #v:foo, not a '-35-'-escaped one (ADVICE r4)."""
    assert H.classify_line("foo# :: Int# -> Int#") == (
        "function", ("foo", "Int# -> Int#"))
    assert H.classify_line("data Int#") == ("data", "Int")
    assert H.classify_line("newtype Wrap# a") == ("newtype", "Wrap")
    assert H.classify_line("type T# = Int") == ("type", ("T", "Int"))
    # operators keep their hashes — they are not idents
    assert H.classify_line("(##) :: a -> b") == ("multi", (["##"], "a -> b"))
    rows = list(H.fold_file("f", [
        (0, "@package p"), (1, "module M"), (2, "foo# :: Int#")]))
    fn = [r for r in rows if r[5] == "function"]
    assert fn and fn[0][4] == "foo"
    assert fn[0][8].endswith("#v:foo")
