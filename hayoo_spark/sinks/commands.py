"""Hunt command-language sink (SURVEY.md §2 S10).

The reference drives a Hunt server with a small command language:

- ``insert`` — one per crawled document, carrying a Hunt
  ``ApiDocument`` (uri, description map, index map, optional weight;
  hayooIndexer/src/Hayoo/Hunt/ApiDocument.hs:30-50, Output.hs:100-143);
- ``update`` — re-weight an existing document
  (newHayooIndexer/src/JsonUtil.hs:115-121 ``buildUpdateWeight``);
- ``delete-by-query`` — drop every doc matching a context-scoped
  case-fullword query, used package-wise before re-insert
  (newHayooIndexer/src/FctIndexerCore.hs:95-105,
  hayooIndexer/src/Hayoo/Hunt/FctIndexerCore.hs:169-183);
- ``insert-context`` / ``delete-context`` — the index-schema DDL
  (hayooIndexer/src/Hayoo/Hunt/IndexSchema.hs:91-149, serialized
  byte-shape in newHayooIndexer/00-schema.js);
- ``noop`` (JsonUtil.hs:110-112) and command *sequences* — a JSON
  array of commands is Hunt's ``cmdSequence`` / one POST batch
  (00-schema.js is itself one such array; batch size 1024 via
  ``--maxpar``, hayooIndexer/src/HayooIndexer.hs:85,749-754).

This module emits the same streams as JSON text from pure JVM
expressions (plus a linear executor-side chunker for batching), so a
reference deployment can bootstrap (schema DDL), bulk-load (inserts),
upsert (delete-before-insert), and re-weight (rank pass) from this
engine's output unchanged; the HTTP transport is the deployment's POST
loop — at 10^12 docs the files ARE the queue.

The boring-document filter (empty index + empty description + default
weight never reaches the server, ApiDocument.hs:47-50) is applied
exactly.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.builder import extract_text
from ..index.fields import DEFAULT_FIELDS, FieldSpec
from ..analysis import extract_title_col

#: reference date-context regexp — truncatable ISO-8601 prefix
#: (IndexSchema.hs:144-149, verbatim in 00-schema.js)
DATE_REGEXP = ("[0-9]{4}(-[0-9]{2}(-[0-9]{2}"
               "(T[0-9]{2}:[0-9]{2}:[0-9]{2})?)?)?")
#: default text-context regexp (IndexSchema.hs:152 ``setCxRegEx "\\w*"``)
TEXT_REGEXP = r"\w*"
#: reference insert batch size (HayooIndexer.hs:85 ``--maxpar``)
DEFAULT_BATCH = 1024
#: fmtDateXmlSchema "%FT%X" (JsonUtil.hs:91-92)
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss"

#: per-context regexps for the full Hayoo schema, verbatim from
#: 00-schema.js / IndexSchema.hs:103-149 (date contexts get
#: DATE_REGEXP, everything absent here gets TEXT_REGEXP)
HAYOO_REGEXPS: dict[str, str] = {
    "dependencies": "[^ ]*",
    "module": ".*",
    "name": "[^ ]*",
    "package": ".*",
    "partial": "[^ ]*",
    "source": ".*",
    "version": ".*",
    "signature": "[^$\n]*",
    "subsig": "[^$\n]*",
}


# ---------------------------------------------------------------- documents

def api_documents(pages: DataFrame,
                  fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS) -> DataFrame:
    """pages -> (uri, description, index, weight) ApiDocument rows.

    Accepts either the html pages shape (text extracted, title context
    available) or a text-only corpus (``text`` column, no title).

    Date-typed contexts are carried in the index map as xml-schema ISO
    strings (``%FT%X``), exactly how the reference sends its
    ``upload``/``indexed`` contexts (FctIndexerCore's buildDocument via
    fmtDateXmlSchema, JsonUtil.hs:91-92; context schemas in
    00-schema.js)."""
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
            if f.source not in pages.columns:
                continue
            val = F.coalesce(
                F.date_format(F.col(f.source).cast("timestamp"), ISO_FMT),
                F.lit(""))
            idx_entries.append((f.name, val))
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


def insert_commands(pages: DataFrame,
                    fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                    ) -> DataFrame:
    """One JSON command per document: {"cmd": "insert", "document": …}
    as a single ``value`` string column."""
    docs = api_documents(pages, fields)
    return docs.select(F.to_json(F.struct(
        F.lit("insert").alias("cmd"),
        F.struct("uri", "description", "index", "weight")
        .alias("document"))).alias("value"))


def update_weight_commands(weights: DataFrame, uri: str = "url",
                           weight: str = "boost") -> DataFrame:
    """Doc re-weight stream: {"cmd": "update", "document": {uri,
    weight}} per row (JsonUtil.hs:115-121 buildUpdateWeight — the
    rank/boost pass exported as commands)."""
    return weights.select(F.to_json(F.struct(
        F.lit("update").alias("cmd"),
        F.struct(F.col(uri).alias("uri"),
                 F.col(weight).cast("double").alias("weight"))
        .alias("document"))).alias("value"))


def delete_by_query_commands(values: DataFrame, value_col: str = "name",
                             context: str = "package") -> DataFrame:
    """Context-scoped delete stream — the reference's delete-before-
    insert upsert unit (FctIndexerCore.hs:95-105): one
    {"cmd": "delete-by-query", "query": {type: context, contexts:
    [ctx], query: {op: case, type: fullword, word: v}}} per value."""
    word = F.struct(F.lit("case").alias("op"),
                    F.lit("fullword").alias("type"),
                    F.col(value_col).alias("word"))
    return values.select(F.to_json(F.struct(
        F.lit("delete-by-query").alias("cmd"),
        F.struct(F.lit("context").alias("type"),
                 F.array(F.lit(context)).alias("contexts"),
                 word.alias("query")).alias("query"))).alias("value"))


# ------------------------------------------------------------- schema DDL

def insert_context_cmd(f: FieldSpec, regexp: str | None = None) -> dict:
    """One insert-context command, key-for-key the reference shape
    (00-schema.js; IndexSchema.hs:103-149): ``weight`` omitted at the
    server default 1.0, ``default: false`` only for NoDefault
    contexts, date contexts typed + date-regexp'd."""
    if regexp is None:
        regexp = DATE_REGEXP if f.ftype == "date" else TEXT_REGEXP
    schema: dict = {"regexp": regexp, "type": f.ftype}
    if f.weight != 1.0:
        schema["weight"] = f.weight
    if not f.default:
        schema["default"] = False
    return {"cmd": "insert-context", "context": f.name, "schema": schema}


def schema_commands(fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                    regexps: dict[str, str] | None = None) -> list[dict]:
    """createHayooIndexSchema analogue (IndexSchema.hs:91-96): the
    insert-context sequence for this engine's field schema."""
    regexps = regexps or {}
    return [insert_context_cmd(f, regexps.get(f.name)) for f in fields]


def drop_schema_commands(fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                         ) -> list[dict]:
    """dropHayooIndexSchema analogue (IndexSchema.hs:97-101)."""
    return [{"cmd": "delete-context", "context": f.name} for f in fields]


def noop_cmd() -> dict:
    """buildNOOP (JsonUtil.hs:110-112)."""
    return {"cmd": "noop"}


# ------------------------------------------------------------- writers

def write_insert_commands(pages: DataFrame, path: str,
                          fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                          ) -> None:
    """One JSON line per document insert — the Hunt command stream,
    partitioned into as many files as there are tasks (each file is
    one POST batch)."""
    insert_commands(pages, fields).write.mode("overwrite").text(path)


def write_command_batches(cmds: DataFrame, path: str,
                          batch: int = DEFAULT_BATCH) -> None:
    """Chunk a one-command-per-row stream into cmdSequence lines: each
    output line is a JSON ARRAY of up to ``batch`` commands — Hunt's
    sequence form (00-schema.js is one such array) at the reference's
    POST batch size (--maxpar 1024).  Chunking is a linear
    executor-side pass (mapInPandas), no shuffle."""
    import pandas as pd

    def chunk(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        buf: list[str] = []
        for pdf in batches:
            buf.extend(pdf["value"].tolist())
            while len(buf) >= batch:
                yield pd.DataFrame(
                    {"value": ["[" + ", ".join(buf[:batch]) + "]"]})
                buf = buf[batch:]
        if buf:
            yield pd.DataFrame({"value": ["[" + ", ".join(buf) + "]"]})

    (cmds.mapInPandas(chunk, "value string")
     .write.mode("overwrite").text(path))


def stream_insert_commands(pages_stream: DataFrame, path: str,
                           checkpoint: str,
                           fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS):
    """Continuous Hunt feed: a STREAMING pages source drains into
    batch-numbered insert-command directories (`batch=NNNNNNNN/`,
    lexicographic = arrival order), exactly-once via the checkpoint —
    the streaming twin of write_insert_commands and the reference's
    continuous-indexing loop (crawler → indexer → POST) re-expressed
    as Structured Streaming.  Returns the StreamingQuery; callers
    trigger availableNow in tests, continuous in deployment."""
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        insert_commands(batch_df, fields).write.mode("overwrite").text(
            os.path.join(path, f"batch={batch_id:08d}"))

    return (pages_stream.writeStream.foreachBatch(_write)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def write_command_stream(path: str, pages: DataFrame,
                         fields: tuple[FieldSpec, ...] = DEFAULT_FIELDS,
                         deletes: DataFrame | None = None,
                         delete_context: str = "package",
                         weights: DataFrame | None = None,
                         batch: int | None = None,
                         regexps: dict[str, str] | None = None) -> None:
    """The full replayable stream, phase-ordered by directory name so
    lexicographic replay IS the reference's cmdSequence order
    (delete-before-insert upsert, FctIndexerCore.hs:169-183; weight
    updates last like the rank pass):

    - ``00-schema.json``  — one JSON array: insert-context DDL
      (the reference ships exactly this file as 00-schema.js)
    - ``01-delete/``      — delete-by-query lines (if ``deletes``)
    - ``02-insert/``      — insert lines
    - ``03-update/``      — update-weight lines (if ``weights``)

    ``batch`` groups doc commands into JSON-array lines of that size
    instead of one command per line."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "00-schema.json"), "w") as fh:
        json.dump(schema_commands(fields, regexps), fh, indent=2)

    def _write(df: DataFrame, sub: str) -> None:
        if batch:
            write_command_batches(df, os.path.join(path, sub), batch)
        else:
            df.write.mode("overwrite").text(os.path.join(path, sub))

    if deletes is not None:
        _write(delete_by_query_commands(
            deletes, deletes.columns[0], delete_context), "01-delete")
    _write(insert_commands(pages, fields), "02-insert")
    if weights is not None:
        _write(update_weight_commands(
            weights, weights.columns[0], weights.columns[1]), "03-update")
