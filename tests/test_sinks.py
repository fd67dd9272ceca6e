"""S10 data shape: the full Hunt command language — insert, update
(weight), delete-by-query, insert-context DDL, noop, sequence batches
(newHayooIndexer/src/JsonUtil.hs:110-121, FctIndexerCore.hs:95-105,
00-schema.js, hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:91-149)."""

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


def test_date_context_in_index_map(spark):
    """ftype=date fields ride the index map as %FT%X ISO strings —
    the reference's upload/indexed contexts (JsonUtil.hs:91-92
    fmtDateXmlSchema; 00-schema.js date schemas)."""
    import pandas as pd

    from hayoo_spark.index.fields import FieldSpec
    from hayoo_spark.sinks import commands as C

    pdf = pd.DataFrame({
        "url": ["https://a.org/d1"],
        "text": ["words here"],
        "upload_ts": [pd.Timestamp("2014-02-03 04:05:06")],
    })
    fields = (FieldSpec("text", 1.0, True, "body"),
              FieldSpec("upload", 1.0, False, "upload_ts", "date"))
    doc = C.api_documents(
        spark.createDataFrame(pdf), fields).collect()[0]
    assert doc["index"]["upload"] == "2014-02-03T04:05:06"
    assert doc["index"]["text"] == "words here"


def test_update_weight_commands(spark):
    from hayoo_spark.sinks import commands as C

    df = spark.createDataFrame(
        [("https://a.org/x", 7.5)], "url string, boost double")
    got = json.loads(C.update_weight_commands(df).collect()[0]["value"])
    # exact buildUpdateWeight shape (JsonUtil.hs:115-121)
    assert got == {"cmd": "update",
                   "document": {"uri": "https://a.org/x", "weight": 7.5}}


def test_delete_by_query_commands(spark):
    from hayoo_spark.sinks import commands as C

    df = spark.createDataFrame([("acme",)], "name string")
    got = json.loads(
        C.delete_by_query_commands(df).collect()[0]["value"])
    # exact buildDelete shape (FctIndexerCore.hs:95-105 + fullWord)
    assert got == {
        "cmd": "delete-by-query",
        "query": {"type": "context", "contexts": ["package"],
                  "query": {"op": "case", "type": "fullword",
                            "word": "acme"}}}


def test_schema_ddl_matches_reference_shapes():
    """insert-context commands must match 00-schema.js key-for-key for
    schema-equivalent contexts (weight omitted at 1.0, default only
    when false, date regexp + type)."""
    from hayoo_spark.index.fields import FieldSpec
    from hayoo_spark.sinks import commands as C

    name = FieldSpec("name", 3.0, True, "body")
    upload = FieldSpec("upload", 1.0, False, "upload_ts", "date")
    author = FieldSpec("author", 1.0, True, "body")
    got = C.schema_commands((name, upload, author),
                            regexps={"name": "[^ ]*"})
    assert got[0] == {"cmd": "insert-context", "context": "name",
                      "schema": {"regexp": "[^ ]*", "type": "text",
                                 "weight": 3.0}}
    assert got[1] == {
        "cmd": "insert-context", "context": "upload",
        "schema": {"regexp": "[0-9]{4}(-[0-9]{2}(-[0-9]{2}"
                             "(T[0-9]{2}:[0-9]{2}:[0-9]{2})?)?)?",
                   "type": "date", "default": False}}
    assert got[2] == {"cmd": "insert-context", "context": "author",
                      "schema": {"regexp": r"\w*", "type": "text"}}
    assert C.drop_schema_commands((name,)) == [
        {"cmd": "delete-context", "context": "name"}]
    assert C.noop_cmd() == {"cmd": "noop"}


def test_stream_insert_commands(spark, tmp_path):
    """Streaming pages -> batch-numbered insert-command dirs with
    exactly-once checkpointing; a second drain adds nothing."""
    from pyspark.sql import functions as F

    from hayoo_spark.sinks import commands as C

    src = str(tmp_path / "pages_src")
    pages = _pages(spark, [
        ("https://s.org/p%d" % i,
         ("<html><body>streamed doc %d</body></html>" % i).encode())
        for i in range(6)])
    pages.write.parquet(src)
    stream = spark.readStream.schema("url string, html binary").parquet(src)
    out = str(tmp_path / "cmds")
    ckpt = str(tmp_path / "ckpt")
    q = C.stream_insert_commands(stream, out, ckpt)
    q.awaitTermination(120)
    lines = []
    for p in glob.glob(out + "/batch=*/part-*"):
        with open(p) as fh:
            lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert sorted(c["document"]["uri"] for c in lines) == \
        ["https://s.org/p%d" % i for i in range(6)]
    # drain again: checkpoint makes it a no-op (exactly-once)
    stream2 = spark.readStream.schema("url string, html binary").parquet(src)
    q2 = C.stream_insert_commands(stream2, out, ckpt)
    q2.awaitTermination(120)
    lines2 = []
    for p in glob.glob(out + "/batch=*/part-*"):
        with open(p) as fh:
            lines2 += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines2) == len(lines)


def test_write_command_stream_phases_and_batches(spark, tmp_path):
    """Phase-ordered replay layout + cmdSequence array batching."""
    from pyspark.sql import functions as F

    from hayoo_spark.sinks import commands as C

    pages = _pages(spark, [
        ("https://a.org/p%d" % i,
         ("<html><body>doc %d words</body></html>" % i).encode())
        for i in range(5)
    ])
    deletes = spark.createDataFrame([("oldpkg",)], "name string")
    weights = spark.createDataFrame(
        [("https://a.org/p1", 2.0)], "url string, boost double")
    out = str(tmp_path / "stream")
    C.write_command_stream(out, pages, deletes=deletes, weights=weights,
                           batch=2)
    subs = sorted(p.rsplit("/", 1)[-1] for p in glob.glob(out + "/*"))
    assert subs == ["00-schema.json", "01-delete", "02-insert",
                    "03-update"]
    with open(out + "/00-schema.json") as fh:
        ddl = json.load(fh)
    assert [c["cmd"] for c in ddl] == ["insert-context"]
    batches = []
    for p in glob.glob(out + "/02-insert/part-*"):
        with open(p) as fh:
            batches += [json.loads(ln) for ln in fh if ln.strip()]
    # every line is a JSON ARRAY (a cmdSequence) of <= 2 commands
    assert all(isinstance(b, list) and 1 <= len(b) <= 2 for b in batches)
    docs = [c["document"]["uri"] for b in batches for c in b]
    assert sorted(docs) == ["https://a.org/p%d" % i for i in range(5)]
    dels = []
    for p in glob.glob(out + "/01-delete/part-*"):
        with open(p) as fh:
            dels += [json.loads(ln) for ln in fh if ln.strip()]
    assert dels[0][0]["cmd"] == "delete-by-query"


def test_command_stream_carries_per_context_regexps(spark, tmp_path):
    """index_hackage's stream must ship the reference's per-context
    regexps in 00-schema.json, not the '\\w*' default (ADVICE r4)."""
    import json

    from hayoo_spark.index.fields import HAYOO_FIELDS
    from hayoo_spark.sinks.commands import HAYOO_REGEXPS, write_command_stream

    pages = spark.createDataFrame(
        [("u://1", "t", "p", "m", "n", "f", "s", "", "", "", "", "", "", "")],
        "url string, text string, package string, module string, "
        "name string, fct_type string, signature string, version string, "
        "synopsis string, author string, category string, "
        "maintainer string, dependencies string, source string")
    out = tmp_path / "cmds"
    write_command_stream(str(out), pages, fields=HAYOO_FIELDS,
                         regexps=HAYOO_REGEXPS)
    schema = json.loads((out / "00-schema.json").read_text())
    by_ctx = {c["context"]: c["schema"]["regexp"] for c in schema}
    assert by_ctx["module"] == HAYOO_REGEXPS["module"]
    assert by_ctx["module"] != r"\w*"
    for ctx, rx in HAYOO_REGEXPS.items():
        if ctx in by_ctx:
            assert by_ctx[ctx] == rx, ctx
