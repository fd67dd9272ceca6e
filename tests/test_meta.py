"""S3 metadata-block scan: cabal-style key/value parsing."""

CABAL = """\
name: acme-base
version: 1.2.3
synopsis: a package
  that spans lines
build-depends: base >=4.7 && <5, containers ==0.6.*,
  text, bytestring
"""


def test_parse_meta_extracts_keys_and_folds_continuations(spark):
    from hayoo_spark.ops import meta

    df = spark.createDataFrame([(CABAL,)], "meta string")
    row = meta.parse_meta(df).collect()[0]
    assert row["name"] == "acme-base"
    assert row["version"] == "1.2.3"
    assert row["synopsis"] == "a package that spans lines"
    assert row["build_depends"] == (
        "base >=4.7 && <5, containers ==0.6.*, text, bytestring")


def test_parse_meta_absent_key_is_empty(spark):
    from hayoo_spark.ops import meta

    df = spark.createDataFrame([("name: x\n",)], "meta string")
    row = meta.parse_meta(df).collect()[0]
    assert row["name"] == "x"
    assert row["version"] == ""
    assert row["build_depends"] == ""


def test_depends_edges_strip_constraints(spark):
    from hayoo_spark.ops import meta

    df = spark.createDataFrame([(CABAL,)], "meta string")
    got = {(r["src"], r["dst"])
           for r in meta.depends_edges(df).collect()}
    assert got == {("acme-base", "base"), ("acme-base", "containers"),
                   ("acme-base", "text"), ("acme-base", "bytestring")}
