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
                     file_col: str | None = "file") -> DataFrame:
    """(…, line_no, text) -> one row per record: (…, record_id, header,
    body, n_lines).  A record starts at each line matching
    ``marker_re``; lines before the first marker (file preamble /
    comments) are dropped — the reference parser skips them too.

    ``file_col`` is REQUIRED: the cumulative-sum window partitions by
    it, so each file folds inside its own task.  Passing ``None``
    (a single global record stream) would put the whole corpus through
    one window task — a scale failure, so it raises instead; callers
    with a genuinely unpartitioned stream should add a constant column
    only when they know the input is small."""
    if not file_col:
        raise ValueError(
            "assemble_records needs a partition column (file_col): a "
            "global Window.orderBy would funnel the entire corpus "
            "through a single task")
    parts = [file_col]
    w = Window.partitionBy(*parts).orderBy(order)
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


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, line_no, text) with an EXPLICIT per-file line offset.

    Reads whole files (``wholetext``) and splits lines with
    ``posexplode`` in the executor, so ``line_no`` is the true
    zero-based offset inside its file by construction — no reliance on
    split-enumeration order (``monotonically_increasing_id`` only
    tracks byte order if text splits enumerate in byte-offset order,
    an implementation detail).  Whole-file reads are fine here: the
    record sources this feeds (hoogle exports, WET segments) ship as
    many bounded-size files, and parallelism is per-file either way —
    a marker fold can never split one file across tasks."""
    df = spark.read.text(path, wholetext=True)
    # a trailing newline is a line TERMINATOR, not an empty final line
    body = F.regexp_replace(F.col("value"), "\n$", "")
    return (df
            .select(F.input_file_name().alias("file"),
                    F.posexplode(F.split(body, "\n"))
                    .alias("line_no", "text")))


def read_text_records(spark: SparkSession, path: str,
                      marker_re: str = DEFAULT_MARKER) -> DataFrame:
    """Read text file(s) and assemble marker-delimited records."""
    return assemble_records(read_text_lines(spark, path), marker_re,
                            file_col="file")
