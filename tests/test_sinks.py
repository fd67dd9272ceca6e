"""S10 data shape: Hunt insert-command stream emission."""

import glob
import json


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_api_documents_shape_and_boring_filter(spark):
    from hayoo_spark.sinks import commands as C

    rows = [
        ("https://a.org/p1",
         b"<html><head><title>Alpha Doc</title></head>"
         b"<body>walrus otter</body></html>"),
        ("https://a.org/empty", b"<html><body></body></html>"),  # boring
    ]
    from hayoo_spark.index.fields import FieldSpec

    fields = (FieldSpec("text", 1.0, True, "body"),
              FieldSpec("title", 2.0, True, "title"))
    got = {r["uri"]: r for r in
           C.api_documents(_pages(spark, rows), fields).collect()}
    assert set(got) == {"https://a.org/p1"}
    doc = got["https://a.org/p1"]
    assert doc["description"]["name"] == "Alpha Doc"
    assert doc["index"]["text"] == "walrus otter"
    assert doc["index"]["title"] == "alpha doc"  # tokenized context
    assert doc["weight"] is None  # 1.0 -> omitted (noScore)


def test_write_insert_commands_roundtrip(spark, tmp_path):
    from hayoo_spark.sinks import commands as C

    from pyspark.sql import functions as F

    rows = [("https://a.org/w",
             b"<html><head><title>Tee</title></head>"
             b"<body>bee cee</body></html>")]
    pages = _pages(spark, rows).withColumn("boost", F.lit(2.5))
    out = str(tmp_path / "cmds")
    C.write_insert_commands(pages, out)
    lines = []
    for p in glob.glob(out + "/part-*"):
        with open(p) as fh:
            lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines) == 1
    cmd = lines[0]
    assert cmd["cmd"] == "insert"
    d = cmd["document"]
    assert d["uri"] == "https://a.org/w"
    assert d["weight"] == 2.5
    assert d["index"]["text"] == "bee cee"
    assert d["description"]["name"] == "Tee"
