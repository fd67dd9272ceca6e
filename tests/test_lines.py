"""S8/T11 line->record fold: marker-delimited record assembly."""

HOOGLE = """\
-- comment preamble
-- more comment
@package acme
@version 1.0
doc line one
@package beta
only line
"""


def test_assemble_records_requires_partition_col(spark):
    """A global (unpartitioned) window would fold the whole corpus in
    ONE task — the API refuses it instead (VERDICT r3 #1)."""
    import pytest

    from hayoo_spark.sources import lines as L

    df = spark.createDataFrame([(0, "@package a")],
                               "line_no long, text string")
    with pytest.raises(ValueError, match="partition column"):
        L.assemble_records(df, file_col=None)


def test_read_text_lines_explicit_offsets(spark, tmp_path):
    """line_no is the true zero-based per-file offset by construction
    (posexplode over the whole file), not a split-order artifact."""
    from hayoo_spark.sources import lines as L

    (tmp_path / "a.txt").write_text("l0\nl1\nl2\n")
    (tmp_path / "b.txt").write_text("m0\nm1\n")
    rows = L.read_text_lines(spark, str(tmp_path)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file"].rsplit("/", 1)[-1], []).append(
            (r["line_no"], r["text"]))
    assert sorted(by_file["a.txt"]) == [(0, "l0"), (1, "l1"), (2, "l2")]
    assert sorted(by_file["b.txt"]) == [(0, "m0"), (1, "m1")]


def test_assemble_records_basic(spark):
    from hayoo_spark.sources import lines as L

    rows = [(i, t) for i, t in enumerate(HOOGLE.splitlines())]
    df = spark.createDataFrame(rows, "line_no long, text string")
    df = df.withColumn("file", df.line_no * 0)  # single known-small file
    got = sorted(
        (r["record_id"], r["header"], r["body"], r["n_lines"])
        for r in L.assemble_records(df).collect())
    assert got == [
        (1, "@package acme",
         "@package acme\n@version 1.0\ndoc line one", 3),
        (2, "@package beta", "@package beta\nonly line", 2),
    ]


def test_read_text_records_multifile(spark, tmp_path):
    """File order reconstructed per file; records never cross files."""
    from hayoo_spark.sources import lines as L

    (tmp_path / "a.txt").write_text(HOOGLE)
    (tmp_path / "b.txt").write_text("@package solo\nx\ny\n")
    got = L.read_text_records(spark, str(tmp_path)).collect()
    by_header = {r["header"]: r for r in got}
    assert set(by_header) == {"@package acme", "@package beta",
                              "@package solo"}
    assert by_header["@package solo"]["body"] == "@package solo\nx\ny"
    assert by_header["@package acme"]["n_lines"] == 3


def test_records_feed_meta_parser(spark):
    """S8 -> S3 composition: assembled records parse as metadata
    blocks (the reference's hoogle -> package-info path)."""
    from hayoo_spark.ops import meta
    from hayoo_spark.sources import lines as L

    text = ("@package acme\nname: acme\nbuild-depends: base, text\n"
            "@package beta\nname: beta\nbuild-depends: acme\n")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(text.splitlines())],
        "line_no long, text string")
    df = df.withColumn("file", df.line_no * 0)
    recs = L.assemble_records(df, text="text")
    edges = {(r["src"], r["dst"]) for r in
             meta.depends_edges(recs, text_col="body").collect()}
    assert edges == {("acme", "base"), ("acme", "text"), ("beta", "acme")}
