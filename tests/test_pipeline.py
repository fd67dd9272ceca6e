"""The composed gen-2 pipeline (SURVEY.md §3.2): cabal+hoogle tarballs
in -> 18-context index + Hunt command stream out, with package-rank
document weights (newHayooIndexer MainHoogle flow)."""

import glob
import io
import json
import tarfile

import pytest


def _tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 1_700_000_000
            tf.addfile(info, io.BytesIO(payload))


CABALS = {
    "base": (b"name: base\nversion: 4.19.0.0\n"
             b"synopsis: Core libraries\nauthor: Core Team\n"
             b"category: Prelude\nmaintainer: core@h.org\n"
             b"build-depends:\n"),
    "acme": (b"name: acme\nversion: 1.2.0\n"
             b"synopsis: Acme utilities walrus\nauthor: A. Hacker\n"
             b"category: Data\nmaintainer: a@h.org\n"
             b"build-depends: base >= 4, text\n"),
    # an OLD acme version that latest-version dedup must drop
    "acme-old": (b"name: acme\nversion: 1.1.0\n"
                 b"synopsis: OLD SYNOPSIS\nauthor: A. Hacker\n"
                 b"category: Data\nmaintainer: a@h.org\n"
                 b"build-depends: base\n"),
    "webby": (b"name: webby\nversion: 0.3\n"
              b"synopsis: Web things otter\nauthor: W. Dev\n"
              b"category: Web\nmaintainer: w@h.org\n"
              b"build-depends: base, acme\n"),
}

HOOGLES = {
    "acme": (b"@package acme\n@version 1.2.0\n"
             b"module Acme.List\n"
             b"-- | Apply a function to every element.\n"
             b"mapx :: (a -> b) -> [a] -> [b]\n"
             b"data Scenario\n"),
    # idx is re-exported from two modules: same name/signature/
    # description/package -> the gen-1 re-export merge must keep ONE
    # doc (first URI) carrying both homes (FctIndexerCore.hs:196-244)
    "base": (b"@package base\nmodule Prelude\n"
             b"idx :: a -> a\n"
             b"module Data.Function\n"
             b"idx :: a -> a\n"),
    "webby": (b"@package webby\nmodule Webby\n"
              b"serve :: Int -> IO ()\n"),
}


@pytest.fixture(scope="module")
def hackage(spark, tmp_path_factory):
    from hayoo_spark.pipeline import index_hackage

    d = tmp_path_factory.mktemp("hackage")
    (d / "cabal").mkdir()
    (d / "hoogle").mkdir()
    _tar(d / "cabal" / "index.tar",
         [(f"{k}/{k}.cabal", v) for k, v in CABALS.items()])
    _tar(d / "hoogle" / "hoogle.tar",
         [(f"{k}/{k}.txt", v) for k, v in HOOGLES.items()])
    ix = str(d / "ix")
    cmds = str(d / "cmds")
    m = index_hackage(spark, str(d / "hoogle"), str(d / "cabal"), ix,
                      commands_dir=cmds, n_segments=2,
                      salt_df_threshold=64)
    return d, ix, cmds, m


def test_pipeline_corpus_and_meta_join(hackage, spark):
    d, ix, _, _ = hackage
    corpus = spark.read.parquet(str(d / "ix.corpus"))
    rows = {r["url"]: r for r in corpus.collect()}
    mapx = next(r for u, r in rows.items() if u.endswith("#v:mapx"))
    # latest-version dedup: acme 1.2.0's synopsis, not the old one
    assert mapx["synopsis"] == "Acme utilities walrus"
    assert mapx["package"] == "acme" and mapx["module"] == "Acme.List"
    assert mapx["signature"] == "(a -> b) -> [a] -> [b]"
    assert mapx["fct_type"] == "function"
    assert "Apply a function" in mapx["text"]
    # rank: base (2 dependents incl. transitive) > webby (0 dependents)
    serve = next(r for u, r in rows.items() if u.endswith("#v:serve"))
    idx = next(r for u, r in rows.items() if u.endswith("#v:idx"))
    assert idx["boost"] > serve["boost"]
    assert serve["boost"] == 1.0


def test_pipeline_index_queries(hackage, spark):
    from hayoo_spark.query.engine import SearchEngine

    _, ix, _, _ = hackage
    eng = SearchEngine(spark, ix)
    # name context (weight 3) finds the decl
    hits = eng.search("mapx", k=5)
    assert hits and hits[0][0].endswith("#v:mapx")
    # package-scoped query
    hits = eng.search("package:acme", k=10)
    assert {u.rsplit("#", 1)[-1] for u, _ in hits} >= {"v:mapx"}
    # signature search through the frontend planner
    hits = eng.search_frontend("(a -> b) -> [a] -> [b]", k=5)
    assert hits and hits[0][0].endswith("#v:mapx")
    # synopsis context
    hits = eng.search("walrus", k=5)
    assert hits and "#v:" in hits[0][0] or hits[0][0].endswith("#")


def test_pipeline_command_stream(hackage):
    _, _, cmds, _ = hackage
    with open(cmds + "/00-schema.json") as fh:
        ddl = json.load(fh)
    assert [c["cmd"] for c in ddl] == ["insert-context"] * 18
    dels = []
    for p in glob.glob(cmds + "/01-delete/part-*"):
        with open(p) as fh:
            dels += [json.loads(ln) for ln in fh if ln.strip()]
    assert {d["query"]["query"]["word"] for d in dels} == \
        {"base", "acme", "webby"}
    ins = []
    for p in glob.glob(cmds + "/02-insert/part-*"):
        with open(p) as fh:
            ins += [json.loads(ln) for ln in fh if ln.strip()]
    uris = {c["document"]["uri"] for c in ins}
    assert any(u.endswith("#v:mapx") for u in uris)
    # date contexts ride the index map as ISO strings
    one = next(c for c in ins if c["document"]["uri"].endswith("#v:mapx"))
    assert one["document"]["index"]["upload"] == "2026-01-01T00:00:00"
    ups = []
    for p in glob.glob(cmds + "/03-update/part-*"):
        with open(p) as fh:
            ups += [json.loads(ln) for ln in fh if ln.strip()]
    assert all(u["cmd"] == "update" for u in ups)
    assert any(u["document"]["weight"] > 1.0 for u in ups)


def test_reexport_merge_alt_uris(hackage, spark):
    """A merged re-export keeps one doc (lexicographically-first URI)
    and surfaces every home via search_docs projection — the gen-1
    addListOfUris/addListOfModules enrichment."""
    from hayoo_spark.query.engine import SearchEngine

    d, ix, _, _ = hackage
    corpus = spark.read.parquet(str(d / "ix.corpus"))
    idx_rows = [r for r in corpus.collect() if r["name"] == "idx"]
    assert len(idx_rows) == 1  # merged, not two docs
    keeper = idx_rows[0]
    assert "Data-Function" in keeper["url"]  # first URI sorted wins
    assert sorted(keeper["alt_modules"]) == ["Data.Function", "Prelude"]
    assert len(keeper["alt_uris"]) == 2
    assert any(u.endswith("Prelude.html#v:idx")
               for u in keeper["alt_uris"])
    # un-merged docs carry no alternates
    mapx = next(r for r in corpus.collect() if r["name"] == "mapx")
    assert mapx["alt_uris"] is None

    eng = SearchEngine(spark, ix)
    for mode in ("local", "spark"):
        docs = eng.search_docs("name:idx", k=5, mode=mode,
                               fields=("alt_uris", "alt_modules"))
        assert docs, mode
        hit = docs[0]
        assert sorted(hit["alt_modules"]) == ["Data.Function", "Prelude"]
        assert len(hit["alt_uris"]) == 2
