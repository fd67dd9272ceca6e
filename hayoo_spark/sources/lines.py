"""Line-oriented record source (SURVEY.md §2 S8/T11 analogue).

The reference parses Hoogle export files — line-oriented text where a
marker line (``@package`` …) starts a new logical document and the
following lines belong to it — with a sequential stateful fold
(newHayooIndexer's hoogle line parser).  The same shape covers
Common-Crawl WET/WARC dumps: record-start markers with payload lines
between them.

The distributed form needs no per-row state: a cumulative sum of the
marker indicator over the line order IS the record id (one window —
one exchange per file), and record assembly is a sort_array over
(line_no, text) structs inside a regular aggregation.  Everything is
JVM expressions with an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_MARKER = r"^@package\b"


def assemble_records(lines: DataFrame, marker_re: str = DEFAULT_MARKER,
                     text: str = "text", order: str = "line_no",
                     file_col: str | None = None) -> DataFrame:
    """(…, line_no, text) -> one row per record: (…, record_id, header,
    body, n_lines).  A record starts at each line matching
    ``marker_re``; lines before the first marker (file preamble /
    comments) are dropped — the reference parser skips them too."""
    parts = [file_col] if file_col else []
    w = Window.partitionBy(*parts).orderBy(order) if parts \
        else Window.orderBy(order)
    rec = (lines
           .withColumn("_m", F.col(text).rlike(marker_re).cast("int"))
           .withColumn("record_id", F.sum("_m").over(w))
           .filter(F.col("record_id") > 0))
    pair = F.struct(F.col(order).alias("o"), F.col(text).alias("t"))
    agg = (rec.groupBy(*(parts + ["record_id"]))
           .agg(F.sort_array(F.collect_list(pair)).alias("ls")))
    return (agg
            .select(*(parts + ["record_id"]),
                    F.col("ls")[0]["t"].alias("header"),
                    F.concat_ws("\n", F.transform("ls", lambda s: s["t"]))
                    .alias("body"),
                    F.size("ls").alias("n_lines")))


def read_text_records(spark: SparkSession, path: str,
                      marker_re: str = DEFAULT_MARKER) -> DataFrame:
    """Read text file(s) and assemble marker-delimited records.

    Line order inside a file is reconstructed from
    ``monotonically_increasing_id`` — ascending within and across the
    file's splits in split order, the standard Spark idiom for
    line-offset order (splits are enumerated in byte-offset order)."""
    df = (spark.read.text(path)
          .select(F.input_file_name().alias("file"),
                  F.monotonically_increasing_id().alias("line_no"),
                  F.col("value").alias("text")))
    return assemble_records(df, marker_re, file_col="file")
