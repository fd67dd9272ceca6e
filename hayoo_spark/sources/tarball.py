"""Tar-archive entry source (SURVEY.md §2 S2).

The reference indexer walks the Hackage index tarball entry by entry to
discover package metadata and documentation files (hayooIndexer's
00-index.tar scan).  This source reads a directory of tar archives into
an entries DataFrame — one row per archive member — via
``spark.read.format("binaryFile")`` plus an Arrow-batched
``mapInPandas`` expansion, so each archive is opened exactly once on an
executor and never touches the driver.

Scale note: a single tar is not splittable (sequential header chain),
so parallelism = number of archives.  That matches the crawl reality —
WARC/CC dumps and Hackage mirrors ship thousands of ~1 GB archives —
and the docstring contract is "shard upstream": many medium archives,
not one giant one.  ``maxPartitionBytes`` has no effect here;
``binaryFile`` assigns whole files to tasks.
"""

from __future__ import annotations

import fnmatch
import io
import logging
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: schema of the entries relation
ENTRY_SCHEMA = ("archive string, entry string, mtime long, "
                "size long, payload binary")

#: archives above this are skipped (with a logged count): one archive's
#: raw bytes + its decompressed members live in a single Python worker,
#: so an unbounded blob is an executor OOM, not a slow task.  The
#: reference caps fetched payloads the same way (1.5 MB curl
#: max_filesize, hayooIndexer/src/HayooIndexer.hs:106-108) — ours is
#: sized for archive granularity instead of page granularity.
MAX_ARCHIVE_BYTES = 1 << 30  # 1 GiB


def utf8_lenient(col) -> "F.Column":
    """Lenient UTF-8 decode of a binary column, JVM-side.

    ``F.decode(c, 'UTF-8')`` raises MALFORMED_CHARACTER_CODING under
    Spark 4's default ANSI mode, so one bad member (hoogle export
    preambles are not guaranteed well-formed UTF-8 — the reference
    skips such lines rather than failing, ParseHoogle.hs) would abort
    the whole job.  A binary→string cast goes through UTF8String,
    which substitutes U+FFFD for invalid sequences and stays inside
    whole-stage codegen."""
    return (F.col(col) if isinstance(col, str) else col).cast("string")


def read_tar_entries(spark: SparkSession, path: str,
                     pattern: str | None = None,
                     binary_glob: str = "*.tar",
                     max_archive_bytes: int = MAX_ARCHIVE_BYTES,
                     ) -> DataFrame:
    """One row per regular-file member across every archive under
    ``path``.  ``pattern`` (fnmatch, e.g. ``*.cabal``) prunes members
    inside the executor-side scan, before any bytes are shipped.

    Archives larger than ``max_archive_bytes`` are dropped with a
    logged count (the ``length`` predicate is pushed into the
    binaryFile scan, so oversized blobs are never read); counting the
    drops touches file metadata only, not content."""
    src = (spark.read.format("binaryFile")
           .option("pathGlobFilter", binary_glob)
           .load(path))
    if max_archive_bytes is not None:
        dropped = src.filter(F.col("length") > max_archive_bytes).count()
        if dropped:
            log.warning(
                "read_tar_entries(%s): dropping %d archive(s) larger "
                "than %d bytes (cap ensures one archive fits one "
                "executor worker)", path, dropped, max_archive_bytes)
        src = src.filter(F.col("length") <= max_archive_bytes)
    raw = src.select("path", "content")

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for arch_path, blob in zip(pdf["path"], pdf["content"]):
                rows = {"archive": [], "entry": [], "mtime": [],
                        "size": [], "payload": []}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        if pattern and not fnmatch.fnmatch(m.name, pattern):
                            continue
                        f = tf.extractfile(m)
                        rows["archive"].append(arch_path)
                        rows["entry"].append(m.name)
                        rows["mtime"].append(int(m.mtime))
                        rows["size"].append(int(m.size))
                        rows["payload"].append(f.read() if f else b"")
                if rows["entry"]:
                    yield pd.DataFrame(rows)

    return raw.mapInPandas(expand, schema=ENTRY_SCHEMA)


def read_tar_pages(spark: SparkSession, path: str,
                   pattern: str = "*.html") -> DataFrame:
    """Adapter from archived HTML files to the builder's pages shape:
    (url, html) with url = ``tar://<archive-basename>/<entry>`` — the
    same naming the reference uses for tarball-sourced documents."""
    from pyspark.sql import functions as F
    ent = read_tar_entries(spark, path, pattern=pattern)
    url = F.concat(F.lit("tar://"),
                   F.element_at(F.split("archive", "/"), -1),
                   F.lit("/"), F.col("entry"))
    return ent.select(url.alias("url"),
                      utf8_lenient("payload").alias("html"))
