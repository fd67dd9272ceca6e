"""S2 tar-archive entry source: byte-identity, member filter, pages
adapter feeding the index builder."""

import io
import tarfile
import time


def _write_tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            info.mtime = 1_700_000_000
            tf.addfile(info, io.BytesIO(payload))


def test_tar_entries_bytes_identical(spark, tmp_path):
    from hayoo_spark.sources import tarball

    _write_tar(tmp_path / "a.tar",
               [("pkg1/pkg1.cabal", b"name: pkg1\n"),
                ("pkg1/doc.html", b"<html>one</html>"),
                ("pkg2/pkg2.cabal", b"name: pkg2\n")])
    _write_tar(tmp_path / "b.tar",
               [("pkg3/pkg3.cabal", b"name: pkg3\n" * 100)])

    got = {(r["entry"], bytes(r["payload"]), r["size"], r["mtime"])
           for r in tarball.read_tar_entries(
               spark, str(tmp_path)).collect()}
    assert got == {
        ("pkg1/pkg1.cabal", b"name: pkg1\n", 11, 1_700_000_000),
        ("pkg1/doc.html", b"<html>one</html>", 16, 1_700_000_000),
        ("pkg2/pkg2.cabal", b"name: pkg2\n", 11, 1_700_000_000),
        ("pkg3/pkg3.cabal", b"name: pkg3\n" * 100, 1100, 1_700_000_000),
    }


def test_tar_entries_pattern_prunes_members(spark, tmp_path):
    from hayoo_spark.sources import tarball

    _write_tar(tmp_path / "a.tar",
               [("x/x.cabal", b"n"), ("x/readme.md", b"m"),
                ("y/y.cabal", b"n")])
    ents = sorted(r["entry"] for r in tarball.read_tar_entries(
        spark, str(tmp_path), pattern="*.cabal").collect())
    assert ents == ["x/x.cabal", "y/y.cabal"]


def test_tar_entries_size_cap_drops_oversized(spark, tmp_path, caplog):
    """An archive above the cap is dropped (with a logged count), not
    shipped to a worker — the executor-OOM guard."""
    import logging

    from hayoo_spark.sources import tarball

    # tarfile pads archives to 10240-byte blocks: small.tar is 10 KiB,
    # big.tar is forced past a 16 KiB cap
    _write_tar(tmp_path / "small.tar", [("a/a.cabal", b"n: a\n")])
    _write_tar(tmp_path / "big.tar",
               [("b/blob.bin", b"x" * 32768)])
    with caplog.at_level(logging.WARNING,
                         logger="hayoo_spark.sources.tarball"):
        ents = sorted(r["entry"] for r in tarball.read_tar_entries(
            spark, str(tmp_path), max_archive_bytes=16384).collect())
    assert ents == ["a/a.cabal"]
    assert any("dropping 1 archive" in m for m in caplog.messages)


def test_tar_pages_feed_index_build(spark, tmp_path):
    """End-to-end S2→A4→Q2: archived HTML through the pages adapter
    into a built index, then a term query finds the right doc."""
    from hayoo_spark.sources import tarball
    from hayoo_spark.index.builder import build_index
    from hayoo_spark.query.engine import SearchEngine

    _write_tar(tmp_path / "docs.tar", [
        ("one.html", b"<html><title>alpha</title>"
                     b"<body>walrus otter</body></html>"),
        ("two.html", b"<html><title>beta</title>"
                     b"<body>otter badger</body></html>"),
    ])
    pages = tarball.read_tar_pages(spark, str(tmp_path))
    src = str(tmp_path / "pages.parquet")
    pages.write.parquet(src)
    ix = str(tmp_path / "ix")
    build_index(spark, src, ix, n_segments=2)
    eng = SearchEngine(spark, ix)
    hits = [u for u, _ in eng.search("walrus", k=5)]
    assert hits == ["tar://docs.tar/one.html"]
    both = {u for u, _ in eng.search("otter", k=5)}
    assert both == {"tar://docs.tar/one.html", "tar://docs.tar/two.html"}


def test_invalid_utf8_member_does_not_fail_decode(spark, tmp_path):
    """ANSI-mode F.decode raises MALFORMED_CHARACTER_CODING on one bad
    byte; the lenient binary->string cast must survive it (hoogle
    export preambles may be malformed UTF-8 — ADVICE r4).  One bad
    member must not fail the whole pipeline."""
    from hayoo_spark.pipeline import entries_to_lines
    from hayoo_spark.sources.tarball import read_tar_entries

    _write_tar(tmp_path / "x.tar", [
        ("good.txt", b"@package p\nmodule M\n"),
        ("bad.txt", b"pre\xff\xfeamble\n@package q\n"),
    ])
    lines = entries_to_lines(
        read_tar_entries(spark, str(tmp_path), pattern="*.txt"))
    rows = lines.collect()  # must not raise
    texts = {r["text"] for r in rows}
    assert "@package p" in texts and "@package q" in texts
    assert any("�" in t for t in texts)  # replacement, not loss
