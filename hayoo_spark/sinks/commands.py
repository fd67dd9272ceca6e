"""Hunt-compatible insert-command sink (SURVEY.md §2 S10 data shape).

The reference converts every crawled document into a Hunt
``ApiDocument`` — uri, a description map of stored fields (title under
``name``), an index map of context → space-joined token text, and a
doc weight omitted when 1.0 — and POSTs batches of ``insert`` commands
to the Hunt server (hayooIndexer/src/Hayoo/Hunt/ApiDocument.hs:30-50,
Output.hs:100-143).  This sink emits the same command stream as JSON
lines from pure JVM expressions, so a reference deployment can ingest
this engine's corpus unchanged; the HTTP transport is the deployment's
POST loop (network I/O stays out of the Spark job — at 10^12 docs the
files ARE the queue).

The boring-document filter (empty index + empty description + default
weight never reaches the server, ApiDocument.hs:47-50) is applied
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import extract_text
from ..index.fields import DEFAULT_FIELDS, FieldSpec
from ..analysis import extract_title_col


def api_documents(pages: DataFrame,
                  fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS) -> DataFrame:
    """pages -> (uri, description, index, weight) ApiDocument rows.

    Accepts either the html pages shape (text extracted, title context
    available) or a text-only corpus (``text`` column, no title)."""
    from ..index.builder import field_tokens_col
    if "html" in pages.columns:
        df = extract_text(pages)
        title = F.coalesce(extract_title_col(F.col("html")), F.lit(""))
    else:
        df = pages.withColumn("text_x", F.col("text"))
        title = F.lit("")
    idx_entries = []
    for f in fields:
        if f.ftype == "date":
            continue
        idx_entries.append(
            (f.name, F.concat_ws(" ", field_tokens_col(f))))
    index_map = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n, _ in idx_entries]),
            F.array(*[c for _, c in idx_entries])),
        lambda _k, v: v != "")
    descr = F.map_filter(
        F.map_from_arrays(F.array(F.lit("name")), F.array(title)),
        lambda _k, v: v != "")
    wght = F.col("boost") if "boost" in pages.columns else F.lit(1.0)
    out = df.select(
        F.col("url").alias("uri"),
        descr.alias("description"),
        index_map.alias("index"),
        F.when(wght != 1.0, wght).alias("weight"))  # null = omitted
    # boring-doc filter: nothing to index, describe, or weight
    return out.filter((F.size("index") > 0) | (F.size("description") > 0)
                      | F.col("weight").isNotNull())


def write_insert_commands(pages: DataFrame, path: str,
                          fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                          ) -> None:
    """One JSON line per document: {"cmd": "insert", "document": …} —
    the Hunt command stream, partitioned into as many files as there
    are tasks (each file is one POST batch)."""
    docs = api_documents(pages, fields)
    (docs.select(F.to_json(F.struct(
        F.lit("insert").alias("cmd"),
        F.struct("uri", "description", "index", "weight")
        .alias("document"))).alias("value"))
     .write.mode("overwrite").text(path))
