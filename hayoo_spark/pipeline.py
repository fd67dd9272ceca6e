"""The composed gen-2 indexing pipeline (SURVEY.md §3.2) — the
reference's ``newHayooIndexer --cabal index.tar.gz --hoogle
hoogle.tar.gz`` flow as ONE Spark job graph:

1. cabal pass: tar members ``*.cabal`` → key/value meta scan →
   package table (name/version/synopsis/author/category/…, latest
   version wins) + build-depends edge list
   (MainHoogle.hs:83-122, PkgIndexerCore.hs);
2. rank pass: dependents prestige over the package DAG → per-package
   doc weight (PackageRank.hs; ops/graph.dependents_rank);
3. hoogle pass: tar members ``*.txt`` → line streams → the full
   declaration grammar + processLine fold → typed FunctionInfo rows
   (ProcessHoogle.hs:40-66; sources/hoogle.py);
4. join decls × package meta × rank → the 18-context HAYOO_FIELDS
   corpus (one row per declaration, package rank as the document
   weight — FctIndexerCore's score argument);
5. segmented index build (index/builder.py) and, optionally, the Hunt
   command stream for a reference deployment
   (sinks/commands.write_command_stream: schema DDL, delete-before-
   insert per package, weight updates).

Spark shape: the cabal and hoogle passes are independent scans (tar
expansion is executor-side, parallelism = archive count); the only
joins are decl ⋈ package-meta (broadcast — the package table is tiny
next to declarations) and the rank frontier loop (bounded by DAG
depth, lineage-checkpointed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.tarball import utf8_lenient

#: cabal keys projected into the package table (the contexts the
#: reference fills from the package description, IndexSchema.hs:60-85)
CABAL_KEYS = ("name", "version", "synopsis", "author", "category",
              "maintainer", "build-depends")


def entries_to_lines(entries: DataFrame) -> DataFrame:
    """(archive, entry, payload) tar members -> (file, line_no, text)
    line streams, one ``file`` per member — the per-file unit the
    hoogle fold needs (executor-side decode + posexplode; no driver)."""
    body = F.regexp_replace(utf8_lenient("payload"), "\n$", "")
    return (entries
            .select(F.concat_ws("/", "archive", "entry").alias("file"),
                    F.posexplode(F.split(body, "\n"))
                    .alias("line_no", "text")))


def package_table(cabal_entries: DataFrame) -> DataFrame:
    """cabal members -> one row per package, LATEST version wins
    (S4 latest-version dedup; version order is the reference's
    dotted-numeric compare, padded component-wise)."""
    from .ops import meta as M
    blocks = cabal_entries.select(
        utf8_lenient("payload").alias("meta"),
        F.col("mtime"))
    parsed = M.parse_meta(blocks, "meta", CABAL_KEYS) \
        .filter(F.col("name") != "")
    # sortable version: each numeric component zero-padded to 6
    vsort = F.concat_ws(".", F.transform(
        F.split(F.regexp_replace("version", r"[^0-9.]", ""), r"\."),
        lambda c: F.lpad(c, 6, "0")))
    w = Window.partitionBy("name").orderBy(F.col("_vsort").desc())
    return (parsed
            .withColumn("_vsort", vsort)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_vsort", "meta"))


def package_rank(packages: DataFrame, edges: DataFrame) -> DataFrame:
    """(package, rank): dependents prestige over the DAG (R5)."""
    from .ops.graph import dependents_rank
    nodes = packages.select(F.col("name").alias("node"))
    return dependents_rank(nodes, edges).select(
        F.col("node").alias("package"), "rank")


def merge_reexports(decls: DataFrame) -> DataFrame:
    """Gen-1 re-export merge (FctIndexerCore.hs:196-244, toDup/
    lookupDup :276-297): ``function`` declarations whose identity hash
    collides — name + signature + package + description, the module
    deliberately EXCLUDED (ApiDocument.hs:76-81: ``hash64Add [sig, pac,
    sou, fct, typ]`` skips ``_mon``) — are the same function re-exported
    from several modules.  Keep only the lexicographically-first URI
    (``uri == k`` after L.sort) and attach ALL the URIs and their
    module names to the kept row (``addListOfUris``/``addListOfModules``,
    the d'uris / d'module description entries), so a merged result can
    show its other homes.  Non-function rows pass through untouched.

    One hash-partitioned window over the identity key — no driver
    state, no broadcast; collect_list is bounded by re-export fan-out
    (tens, not millions)."""
    key = ["name", "signature", "package", "description"]
    is_f = F.col("fct_type") == "function"
    w = Window.partitionBy(*key).orderBy("doc_uri")
    wall = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    arr = "array<string>"
    fct = (decls.filter(is_f)
           .withColumn("_rn", F.row_number().over(w))
           .withColumn("_uris", F.collect_list("doc_uri").over(wall))
           .withColumn("_mods", F.collect_list("module").over(wall))
           .filter(F.col("_rn") == 1)
           .withColumn("alt_uris", F.when(
               F.size("_uris") > 1, F.col("_uris")).cast(arr))
           .withColumn("alt_modules", F.when(
               F.size("_mods") > 1, F.col("_mods")).cast(arr))
           .drop("_rn", "_uris", "_mods"))
    rest = (decls.filter(~is_f)
            .withColumn("alt_uris", F.lit(None).cast(arr))
            .withColumn("alt_modules", F.lit(None).cast(arr)))
    return fct.unionByName(rest)


def decl_corpus(decls: DataFrame, packages: DataFrame,
                ranks: DataFrame | None = None,
                indexed_ts=None) -> DataFrame:
    """FunctionInfo rows ⋈ package meta (⋈ rank) -> the HAYOO_FIELDS
    corpus shape: one document per declaration, url = doc_uri,
    package rank as the document weight, tar-member mtimes unavailable
    here so ``upload_ts``/``indexed_ts`` come from the caller (the
    reference stamps fmtDateXmlSchema now — pass a deterministic
    timestamp for reproducible builds)."""
    pkg = packages.select(
        F.col("name").alias("package"), "version", "synopsis",
        "author", "category", "maintainer",
        F.col("build_depends").alias("dependencies"))
    df = decls.join(F.broadcast(pkg), "package", "left")
    if ranks is not None:
        df = df.join(F.broadcast(ranks), "package", "left") \
            .withColumn("boost", F.coalesce("rank", F.lit(1.0))) \
            .drop("rank")
    ts = F.lit(indexed_ts).cast("timestamp") if indexed_ts is not None \
        else F.lit(None).cast("timestamp")
    # re-export merge enrichment rides along when present
    extra = [c for c in ("alt_uris", "alt_modules") if c in decls.columns]
    out = df.select(
        F.col("doc_uri").alias("url"),
        F.concat_ws("\n", "name", "description").alias("text"),
        "package", "module", "name", "fct_type", "signature",
        *[F.coalesce(F.col(c), F.lit("")).alias(c)
          for c in ("version", "synopsis", "author", "category",
                    "maintainer", "dependencies")],
        F.lit("").alias("source"),
        ts.alias("upload_ts"), ts.alias("indexed_ts"),
        *([F.col("boost")] if ranks is not None else []),
        *extra)
    # signature fixup before the parser-backed contexts
    # (fixupSignature, ProcessLine.hs:36-44)
    return out.withColumn("signature", F.regexp_replace(
        F.regexp_replace("signature", r"\{- UNPACK -\}", " "), "!", ""))


def index_hackage(spark: SparkSession, hoogle_tar_dir: str,
                  cabal_tar_dir: str, index_dir: str,
                  commands_dir: str | None = None,
                  indexed_ts: str = "2026-01-01T00:00:00",
                  n_segments: int = 8, **build_kwargs) -> dict:
    """The full gen-2 flow, tarballs in → queryable index (and
    optionally the Hunt command stream) out.  Returns build metrics."""
    from .index.builder import build_index
    from .index.fields import HAYOO_FIELDS
    from .ops import meta as M
    from .sources.hoogle import parse_hoogle_decls
    from .sources.tarball import read_tar_entries

    cab = read_tar_entries(spark, cabal_tar_dir, pattern="*.cabal")
    packages = package_table(cab)
    edges = M.depends_edges(
        cab.select(utf8_lenient("payload").alias("meta")))
    ranks = package_rank(packages, edges)

    hg = read_tar_entries(spark, hoogle_tar_dir, pattern="*.txt")
    decls = merge_reexports(parse_hoogle_decls(entries_to_lines(hg)))

    corpus = decl_corpus(decls, packages, ranks, indexed_ts)
    src = index_dir.rstrip("/") + ".corpus"
    corpus.write.mode("overwrite").parquet(src)
    metrics = build_index(spark, src, index_dir,
                          n_segments=n_segments,
                          fields=HAYOO_FIELDS,
                          store_cols=("alt_uris", "alt_modules"),
                          **build_kwargs)
    if commands_dir is not None:
        from .sinks.commands import HAYOO_REGEXPS, write_command_stream
        pages = spark.read.parquet(src)
        write_command_stream(
            commands_dir, pages, fields=HAYOO_FIELDS,
            regexps=HAYOO_REGEXPS,
            deletes=packages.select("name"),
            weights=ranks.select(F.col("package").alias("url_pkg"),
                                 "rank")
            .join(pages.select("url", "package")
                  .withColumnRenamed("package", "url_pkg"), "url_pkg")
            .select("url", F.col("rank").alias("boost")))
    return metrics
