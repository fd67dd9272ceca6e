"""SearchEngine facade: AST -> segment scans -> global top-k.

Two execution modes over the same index layout and the same
SegmentEvaluator (results are identical; tested):

- ``spark``: one Arrow grouped-map task per segment — postings read is
  partition-pruned (parquet pushdown on ``term``), each task emits its
  local top-m, Spark merges (TakeOrderedAndProject).  The mode for a
  1000-executor cluster where segments outnumber driver memory.
- ``local``: the serving-tier path — the driver reads only the needed
  terms' posting rows per segment via pyarrow (row-group pruning works
  because postings are sorted by term within each segment file) and
  evaluates in-process.  Single-digit-ms latency, no job-scheduling
  overhead; the shape a dedicated query node would use against the
  same Iceberg/parquet segment files.

Query lifecycle per SURVEY.md §3.1: parse -> prefix expansion against
the term dictionary (deterministic cap MAX_EXPANSIONS by df desc, term
asc) -> idf map from global stats -> per-segment DAAT with block-max
pruning -> global merge -> offset/limit paging
(hayoo-server/src/Hayoo/App.hs:96-98).
"""

from __future__ import annotations

import bisect
import glob
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from . import plan as P
from .parser import parse
from .wand import (
    SegmentData, SegmentEvaluator, _flat_terms, _flat_with_not,
    docs_loaded, enable_shm_postings_cache, ensure_docs_cache_capacity,
    load_segment_docs,
)

RESULT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("score", DoubleType()),
])

# load the term dictionary driver-side below this many bytes of parquet;
# larger dictionaries stay distributed (web-scale: billions of terms)
DICT_CACHE_BYTES = 256 * 1024 * 1024
#: reduce-side task count for distributed serving queries (see
#: warm(distributed=True)); a real cluster sizes this to executors
SERVING_SHUFFLE_PARTITIONS = 8


#: serving-tier raw-posting-rows cache budget: hot terms' encoded bytes
#: stay in engine memory so a warm query touches NO parquet at all
#: (the per-query dataset re-read dominated warm latency, VERDICT r2)
ROWS_CACHE_BYTES = 512 * 1024 * 1024



class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str,
                 mode: str = "local",
                 dict_cache_bytes: int = DICT_CACHE_BYTES,
                 rows_cache_bytes: int = ROWS_CACHE_BYTES,
                 segments: tuple[int, ...] | None = None):
        from ..index import snapshot
        self.spark = spark
        # a snapshot root resolves to its live version ONCE here — the
        # engine keeps a consistent view of that version's (immutable)
        # files even while snapshot_update publishes newer ones
        self.index_dir = index_dir = snapshot.resolve(index_dir)
        self.mode = mode
        srows = sorted(
            spark.read.parquet(os.path.join(index_dir, "stats")).collect(),
            key=lambda r: r["fkey"])
        self.n_docs = srows[0]["n_docs"]
        # per-field BM25F stats + schema (weights / default-search set);
        # date contexts are range-filter-only — they carry no postings,
        # weights, or norms (IndexSchema.hs:111,120)
        ftypes = {r["field"]: r.asDict().get("ftype", "text") for r in srows}
        trows = [r for r in srows if ftypes[r["field"]] != "date"]
        self.date_fields = tuple(
            f for f, t in ftypes.items() if t == "date")
        self.avgdl = {r["field"]: float(r["avgdl"]) for r in trows}
        self.field_weights = {r["field"]: float(r["weight"]) for r in trows}
        self.default_fields = tuple(
            r["field"] for r in trows if r["is_default"])
        # incremental updates shift avgdl after some segments were encoded;
        # stored block bounds scale by at most avgdl_now[f]/avgdl_enc[f]
        # PER FIELD, so these factors keep block-max pruning admissible
        # (index/update.py).  The manifest records the per-field encode
        # avgdl map (enc_avgdl_json); the per-field min over segments
        # covers every segment.  A cross-field ratio (max-now/min-enc)
        # would inflate bounds ~body-avgdl/title-avgdl on multi-field
        # indexes and disable pruning outright (ADVICE r2).
        man = spark.read.parquet(os.path.join(index_dir, "manifest"))
        self.ub_scale = self._ub_scales(man)
        # serving metrics: EKG-analogue counters + latency distributions
        # per operation (reference /stats surface, Metrics.hs:43-78)
        from .metrics import MetricsStore
        self._metrics = MetricsStore()

        self._terms_df = spark.read.parquet(os.path.join(index_dir, "terms"))
        # driver dict: per field, term-sorted arrays (cutover to the
        # distributed dictionary above DICT_CACHE_BYTES — web scale)
        self._dict: dict[str, tuple[list[str], np.ndarray]] | None = None
        size = sum(os.path.getsize(p) for p in glob.glob(
            os.path.join(index_dir, "terms", "*.parquet")))
        if size <= dict_cache_bytes:
            import pyarrow.parquet as pq
            t = pq.read_table(os.path.join(index_dir, "terms"),
                              columns=["field", "term", "df"]).to_pandas()
            self._dict = {}
            for f, sub in t.groupby("field"):
                sub = sub.sort_values("term", kind="mergesort")
                self._dict[f] = (sub["term"].tolist(),
                                 sub["df"].to_numpy(np.int64))
        # segment universe comes from docs/, a SUPERSET of postings/: a
        # segment whose docs all tokenize to empty (drop_empty=False)
        # writes no postings dir, but its docs must stay visible to
        # filter-only branches of mixed queries (ADVICE r2)
        self._segments = sorted(
            int(os.path.basename(p).split("=")[1]) for p in
            glob.glob(os.path.join(index_dir, "docs", "segment=*")))
        # segment-sharded serving: an engine restricted to a slice of
        # the segment universe is the per-PROCESS scale-out unit (the
        # GIL bounds one process's evaluation throughput; the reference
        # scales by running more Hunt servers, Makefile:32-34).  Shards
        # score with GLOBAL df/avgdl (terms/ and stats/ are corpus-
        # wide), so a merge of shard top-k lists is exactly the
        # unsharded top-k.
        self._sharded = segments is not None
        if segments is not None:
            wanted = set(int(s) for s in segments)
            self._segments = [s for s in self._segments if s in wanted]
        # the process-wide docs cache must hold this engine's whole
        # segment set or every warm query re-reads the evicted tables
        ensure_docs_cache_capacity(len(self._segments))
        # per-host shared decode cache for the grouped-map path (see
        # wand.enable_shm_postings_cache); settable to "" to disable
        shm_root = os.environ.get("HAYOO_SHM_CACHE", "/dev/shm")
        # per-uid dir, created 0700 + ownership-verified in
        # enable_shm_postings_cache (ADVICE r6: a world-shared fixed
        # path lets another local user plant poisoned posting arrays)
        self._shm_cache_dir = (
            os.path.join(shm_root, f"hayoo_decode_cache.{os.getuid()}")
            if shm_root and os.path.isdir(shm_root) else None)
        # the DRIVER joins the host cache too: warm()'s prewarm then
        # publishes its decodes, so grouped-map workers mmap the Zipf
        # head instead of stampeding the postings parquet 32-wide on
        # the first heavy phrase (and a restarted serving process
        # re-warms from tmpfs in milliseconds)
        enable_shm_postings_cache(self._shm_cache_dir)
        # serving-tier raw-rows cache: (field, term) -> {segment: [row]}
        # (LRU by encoded bytes; invalidated when any postings segment
        # dir changes — same mtime contract as the decoded cache)
        self._rows_mem: dict[tuple[str, str], dict[int, list]] = {}
        self._rows_mem_bytes = 0
        self._rows_mem_budget = rows_cache_bytes
        self._rows_stamp: tuple | None = None
        # per-field SymSpell deletion maps, built lazily on first fuzzy
        # query over the driver-cached dictionary
        self._del_maps: dict[str, dict[str, list[int]]] = {}
        # ONE analyzed postings relation for distributed-mode queries:
        # a fresh spark.read.parquet per query re-lists files and
        # re-reads footers — a fixed few-hundred-ms tax per query that
        # dominates the distributed p50 (VERDICT r3 item 7).  The
        # relation is lazy; warm(distributed=True) additionally persists
        # it in executor memory (the cluster analogue of Hunt's
        # index-in-RAM startup; opt-in because the FULL postings
        # relation only fits executor memory at bench scales — a real
        # deployment persists the hot fields/terms projection instead)
        self._post_df = spark.read.parquet(
            os.path.join(index_dir, "postings"))
        self._post_df_persisted = False
        self._post_df_stamp = self._postings_stamp()
        # one engine serves concurrent queries (a server's request
        # threads): the LRU and lazy-built maps mutate under this lock;
        # reads of immutable loaded rows need none
        import threading
        self._lock = threading.RLock()
        # admission gate for the GIL-bound numpy evaluation: concurrent
        # request threads interleaving small-batch numpy work convoy on
        # the GIL (measured: serial 83 qps, 8 free-running threads 12) —
        # queueing them through one gate keeps aggregate throughput at
        # the serial rate while I/O (pyarrow reads, GIL-releasing) still
        # overlaps outside it.  Scale-out beyond one process is the
        # distributed mode / more serving processes.
        self._eval_gate = threading.Lock()

    def _ub_scales(self, man) -> dict[str, float]:
        """Per-field admissibility factors for stored block bounds."""
        import json
        min_enc: dict[str, float] = {}
        if "enc_avgdl_json" in man.columns:
            for r in man.select("enc_avgdl_json").collect():
                for f, v in (json.loads(r[0]) if r[0] else {}).items():
                    min_enc[f] = min(min_enc.get(f, float("inf")), float(v))
        if not min_enc:
            # legacy scalar layout: one conservative cross-field factor
            max_now = max(self.avgdl.values())
            m = man.agg(F.min("enc_avgdl")).collect()[0][0] or max_now
            s = max(1.0, max_now / float(m))
            return {f: s for f in self.avgdl}
        return {
            f: max(1.0, now / min_enc[f])
            if min_enc.get(f, 0.0) > 0 else 1.0
            for f, now in self.avgdl.items()
        }

    # ---------------- planning helpers ----------------

    def idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _expand_fields(self, field: str) -> tuple[str, ...]:
        """Fields a scoring leaf touches: the default set for unscoped
        leaves, the named field when it is indexed, else nothing."""
        if field == P.DEFAULT_FIELD:
            return self.default_fields
        if field in self.field_weights:
            return (field,)
        return ()

    def _dict_prefix_range(self, prefix: str,
                           fields: tuple[str, ...]) -> list[tuple[str, int]]:
        """(term, summed df over `fields`) under `prefix` — ranking
        candidates across the searched field set."""
        acc: dict[str, int] = {}
        for f in fields:
            d = self._dict.get(f)
            if d is None:
                continue
            terms, dfs = d
            lo = bisect.bisect_left(terms, prefix)
            hi = bisect.bisect_left(terms, prefix + "￿")
            for i in range(lo, hi):
                acc[terms[i]] = acc.get(terms[i], 0) + int(dfs[i])
        return list(acc.items())

    def expand_prefix(self, prefix: str,
                      field: str = P.DEFAULT_FIELD) -> list[str]:
        fields = self._expand_fields(field)
        if self._dict is not None:
            cands = self._dict_prefix_range(prefix, fields)
            cands.sort(key=lambda kv: (-kv[1], kv[0]))
            return [t for t, _ in cands[: P.MAX_EXPANSIONS]]
        rows = (
            self._terms_df
            .filter(F.col("field").isin(list(fields))
                    & F.col("term").startswith(prefix))
            .groupBy("term").agg(F.sum("df").alias("df"))
            .orderBy(F.col("df").desc(), F.col("term"))
            .limit(P.MAX_EXPANSIONS)
            .collect()
        )
        return [r["term"] for r in rows]

    def _fuzzy_candidates(self, term: str,
                          fields: tuple[str, ...]) -> list[tuple[str, str, int]]:
        """UNVERIFIED (field, term, df) candidates whose deletion-1 key
        sets intersect the query term's — a small superset of the true
        edit-distance-1 neighborhood, never a dictionary sweep.

        Sources, by index layout: the lazily-built driver deletion map
        (cached-dict path), else the ``terms_fuzzy`` parquet probed on
        del_key (filter pushdown + row-group pruning — the web-scale
        path: O(len(term)) key lookups against 10^9 terms), else a
        legacy full F.levenshtein scan (pre-fuzzy-table indexes)."""
        keys = P.fuzzy_keys(term)
        out: list[tuple[str, str, int]] = []
        if self._dict is not None:
            for f in fields:
                d = self._dict.get(f)
                if d is None:
                    continue
                with self._lock:
                    dm = self._del_maps.get(f)
                    if dm is None:
                        terms, _ = d
                        dm = {}
                        for i, t in enumerate(terms):
                            for k in P.fuzzy_keys(t):
                                dm.setdefault(k, []).append(i)
                        self._del_maps[f] = dm
                terms, dfs = d
                seen: set[int] = set()
                for k in keys:
                    for i in dm.get(k, ()):
                        if i not in seen:
                            seen.add(i)
                            out.append((f, terms[i], int(dfs[i])))
            return out
        fz = os.path.join(self.index_dir, "terms_fuzzy")
        if os.path.exists(fz):
            import pyarrow.parquet as pq
            t = pq.read_table(
                fz, filters=[("del_key", "in", sorted(keys)),
                             ("field", "in", list(fields))]).to_pandas()
            t = t.drop_duplicates(["field", "term"])
            return list(zip(t["field"], t["term"], t["df"].astype(int)))
        rows = (self._terms_df
                .filter(F.col("field").isin(list(fields))
                        & (F.levenshtein(F.col("term"), F.lit(term)) <= 1))
                .groupBy("field", "term").agg(F.sum("df").alias("df"))
                .collect())
        return [(r["field"], r["term"], r["df"]) for r in rows]

    def expand_fuzzy(self, term: str,
                     field: str = P.DEFAULT_FIELD) -> list[str]:
        """Edit-distance-1 dictionary expansion (reference `~` flavor):
        deletion-neighborhood candidate lookup, then the exact verify on
        candidates only (candidate set ≪ dictionary; tested)."""
        fields = self._expand_fields(field)
        acc: dict[str, int] = {}
        for f, t, df in self._fuzzy_candidates(term, fields):
            if P.edit_distance_le1(term, t):
                acc[t] = acc.get(t, 0) + int(df)
        cands = list(acc.items())
        cands.sort(key=lambda kv: (-kv[1], kv[0]))
        return [t for t, _ in cands[: P.MAX_EXPANSIONS]]

    def _rewrite_prefixes(self, node: P.Node) -> P.Node:
        if isinstance(node, P.Prefix):
            terms = self.expand_prefix(node.prefix, node.field)
            return P.Or(tuple(
                P.Term(t, field=node.field, boost=node.boost) for t in terms))
        if isinstance(node, P.Fuzzy):
            terms = self.expand_fuzzy(node.term, node.field)
            return P.Or(tuple(
                P.Term(t, field=node.field, boost=node.boost) for t in terms))
        if isinstance(node, P.And):
            return P.And(tuple(self._rewrite_prefixes(c) for c in node.children))
        if isinstance(node, P.Or):
            return P.Or(tuple(self._rewrite_prefixes(c) for c in node.children))
        if isinstance(node, P.AndNot):
            return P.AndNot(self._rewrite_prefixes(node.left),
                            self._rewrite_prefixes(node.right))
        return node

    def _scoring_pairs(self, node: P.Node) -> set[tuple[str, str]]:
        """(field, term) pairs a plan can score — unscoped leaves expand
        over the default field set."""
        out: set[tuple[str, str]] = set()
        if isinstance(node, P.Term):
            out.update((f, node.term) for f in self._expand_fields(node.field))
        elif isinstance(node, P.Phrase):
            for t in node.terms:
                out.update((f, t) for f in self._expand_fields(node.field))
        elif isinstance(node, (P.And, P.Or)):
            for c in node.children:
                out |= self._scoring_pairs(c)
        elif isinstance(node, P.AndNot):
            out |= self._scoring_pairs(node.left) | self._scoring_pairs(node.right)
        return out

    def _idf_map(self, pairs: set[tuple[str, str]]) -> dict:
        if not pairs:
            return {}
        if self._dict is not None:
            out = {}
            for f, t in pairs:
                tl, dfs = self._dict.get(f, ([], np.zeros(0, np.int64)))
                i = bisect.bisect_left(tl, t)
                df = int(dfs[i]) if i < len(tl) and tl[i] == t else 0
                out[(f, t)] = self.idf(df)
            return out
        rows = self._terms_df.filter(
            F.col("term").isin(list({t for _, t in pairs}))).collect()
        dfs = {(r["field"], r["term"]): r["df"] for r in rows}
        return {(f, t): self.idf(dfs.get((f, t), 0)) for f, t in pairs}

    # ---------------- search ----------------

    def search(self, query: str, k: int = P.PAGE_SIZE, page: int = 0,
               mode: str | None = None) -> list[tuple[str, float]]:
        return self._search_ast(parse(query), k, page, mode)

    def search_frontend(self, query: str, k: int = P.PAGE_SIZE,
                        page: int = 0,
                        mode: str | None = None) -> list[tuple[str, float]]:
        """Q9 — the packaged frontend planner: OR-union of the parsed
        std query and the boosted AND-of-words fallback, with graceful
        degradation on parse errors (parser.parse_frontend; reference
        hayoo-server/src/Hayoo/App.hs:144-200)."""
        from .parser import parse_frontend
        return self._search_ast(parse_frontend(query), k, page, mode)

    def _search_ast(self, ast: P.Node, k: int, page: int,
                    mode: str | None) -> list[tuple[str, float]]:
        with self._metrics.measure("searches"):
            return self._search_ast_unmetered(ast, k, page, mode)

    def _search_ast_unmetered(self, ast: P.Node, k: int, page: int,
                              mode: str | None) -> list[tuple[str, float]]:
        ast = self._rewrite_prefixes(ast)
        needed = self._scoring_pairs(ast)
        m = (page + 1) * k
        if not needed:
            return self._filter_only(ast, m)[page * k :]
        if (mode or self.mode) == "local":
            rows = self._search_local(ast, needed, m)
        else:
            rows = self._search_spark(ast, needed, m)
        return rows[page * k :]

    def _postings_df(self):
        """The shared distributed postings relation, re-analyzed only
        when a postings segment dir changes (same mtime contract as the
        serving caches) — incremental updates invalidate it."""
        stamp = self._postings_stamp()
        with self._lock:
            if stamp != self._post_df_stamp:
                if self._post_df_persisted:
                    self._post_df.unpersist()
                self._post_df = self.spark.read.parquet(
                    os.path.join(self.index_dir, "postings"))
                self._post_df_persisted = False
                self._post_df_stamp = stamp
            return self._post_df

    def _search_spark(self, ast, needed, m):
        terms = list({t for _, t in needed})
        flds = list({f for f, _ in needed})
        post = self._postings_df().filter(
            F.col("term").isin(terms) & F.col("field").isin(flds))
        # position streams are ~5x the rest of the row and most queries
        # never touch them; shipping them JVM→Arrow→python on EVERY
        # query aged the session into GC stalls at 10M.  Workers that
        # do need positions (phrases) serve them from the per-host
        # decode cache, else re-read just their (segment, term) from
        # parquet once per process (SegmentData._rows_with_positions).
        post = post.drop("pos_vb", "block_pos_off")
        if self._sharded:
            # a sharded engine serves ONLY its segment slice in every
            # mode — without this filter spark mode would evaluate the
            # full corpus and the shard-merge contract (each url from
            # exactly one shard) would break
            post = post.filter(F.col("segment").isin(self._segments))
        idf_map = self._idf_map(needed)
        avgdl, ub_scale = self.avgdl, self.ub_scale
        weights, default_fields = self.field_weights, self.default_fields
        date_fields = self.date_fields
        docs_root = os.path.join(self.index_dir, "docs")
        post_root = os.path.join(self.index_dir, "postings")
        avgdl_key = tuple(sorted(self.avgdl.items()))
        n_segments = len(self._segments)
        shm_cache = self._shm_cache_dir
        flat, flat_not = _flat_with_not(ast, self.field_weights)
        # a bare phrase is segment-prunable like a flat query (every
        # term must be present) and has its own bound-ordered evaluator
        is_phrase = isinstance(ast, P.Phrase)
        if flat is None and not is_phrase:
            # non-flat ASTs can hold filter-only branches (lang:/url:/
            # range) whose matches live in segments holding NONE of the
            # scoring terms' postings; a groupBy over the term-filtered
            # postings never forms a group for those segments, silently
            # dropping their docs (ADVICE r1).  A sentinel row per
            # segment (null term, filtered out before decode) guarantees
            # every segment is evaluated, matching local mode.
            sent = self.spark.createDataFrame(
                [(s,) for s in self._segments], "segment int")
            post = post.unionByName(sent, allowMissingColumns=True)

        def eval_segment(key, pdf):
            seg = int(key[0])
            pdf = pdf[pdf["term"].notna()]
            # executor-side caches must be sized to the layout too: the
            # driver grows its docs cache at engine init, but each
            # python worker imports wand fresh with the 64-entry
            # default — at 128 segments every warm query would re-read
            # half the doc tables (the a3fd564 lesson, worker edition)
            ensure_docs_cache_capacity(n_segments)
            # all workers on this host share one decode cache: task→
            # worker assignment is not sticky, so per-process caches
            # alone re-decode on most touches (see wand.py)
            enable_shm_postings_cache(shm_cache)
            docs_pdf = load_segment_docs(docs_root, seg)
            # same cross-query decoded-postings cache key as the local
            # serving tier: python workers are reused across queries,
            # so a worker that re-sees a (segment, term) skips varbyte
            # decode + salt merge entirely (per-worker LRU; the mtime
            # component invalidates on incremental update)
            pdir = f"{post_root}/segment={seg}"
            mt = os.path.getmtime(pdir) if os.path.exists(pdir) else 0.0
            sd = SegmentData(pdf, docs_pdf,
                             cache_key=(post_root, seg, mt, avgdl_key))
            sd._avgdl = avgdl
            ev = SegmentEvaluator(sd, idf_map, avgdl, ub_scale,
                                  weights, default_fields, date_fields)
            if flat is not None:
                ids, sc = ev.top_m_pruned(flat[0], flat[1], m,
                                          exclude=flat_not,
                                          filters=flat[2],
                                          phrases=flat[3])
            elif is_phrase:
                ids, sc = ev.top_m_phrase(ast, m)
            else:
                ids, sc = ev.evaluate(ast)
                ids, sc = ev._cut(ids, sc, m)
            return pd.DataFrame({"url": sd.url_take(ids), "score": sc})

        top = (
            post.groupBy("segment")
            .applyInPandas(eval_segment, RESULT_SCHEMA)
            .orderBy(F.col("score").desc(), F.col("url"))
            .limit(m)
            .collect()
        )
        return [(r["url"], r["score"]) for r in top]

    def _postings_stamp(self) -> tuple:
        dirs = sorted(glob.glob(
            os.path.join(self.index_dir, "postings", "segment=*")))
        return tuple((d, os.path.getmtime(d)) for d in dirs)

    @staticmethod
    def _rows_bytes(by: dict[int, list]) -> int:
        return sum(len(r.ids_vb) + len(r.tfs_vb) + len(r.pos_vb) + 256
                   for rows in by.values() for r in rows)

    def _read_pairs(self, missing: list[tuple[str, str]],
                    ) -> dict[tuple[str, str], dict[int, list]]:
        """Parquet read for cache-missing pairs — ONE dataset scan,
        row-group-pruned via the term filter since postings are
        term-sorted per file.  Called WITHOUT the engine lock held."""
        import pyarrow.parquet as pq
        filters = [("term", "in", sorted({t for _, t in missing})),
                   ("field", "in", sorted({f for f, _ in missing}))]
        if self._sharded:  # shard engines read only their slice's dirs
            filters.append(("segment", "in", list(self._segments)))
        tbl = pq.read_table(
            os.path.join(self.index_dir, "postings"), filters=filters,
        ).to_pandas()
        got: dict[tuple[str, str], dict[int, list]] = \
            {p: {} for p in missing}
        if len(tbl):
            tbl["segment"] = tbl["segment"].astype(int)  # hive col is categorical
            for row in tbl.itertuples(index=False):
                ent = got.get((row.field, row.term))
                if ent is not None:
                    ent.setdefault(int(row.segment), []).append(row)
        return got

    def _fetch_rows(self, pairs: set[tuple[str, str]]) -> dict[int, dict]:
        """Raw posting rows for the (field, term) pairs, as
        {segment: {pair: [row, ...]}} — served from the engine-level
        LRU cache; only cache-missing pairs touch parquet.

        The lock covers only the stamp check / cache bookkeeping, NOT
        the parquet read: a cold (cache-missing) query must not
        head-of-line block fully-warm concurrent queries.  If the index
        is swapped under a read (stamp changes), the stale rows are
        discarded and the fetch retries against the new postings."""
        while True:
            with self._lock:
                stamp = self._postings_stamp()
                if stamp != self._rows_stamp:
                    self._rows_mem.clear()
                    self._rows_mem_bytes = 0
                    self._rows_stamp = stamp
                missing = [p for p in pairs if p not in self._rows_mem]
                if not missing:
                    return self._assemble_locked(pairs)
            got = self._read_pairs(missing)  # lock dropped: slow I/O
            with self._lock:
                if self._rows_stamp != stamp:
                    continue  # index replaced mid-read: rows are stale
                for p, by in got.items():
                    if p in self._rows_mem:  # raced with another cold query
                        continue
                    self._rows_mem[p] = by
                    self._rows_mem_bytes += self._rows_bytes(by)
                # LRU eviction (never the pairs this query needs)
                for p in list(self._rows_mem):
                    if self._rows_mem_bytes <= self._rows_mem_budget:
                        break
                    if p in pairs:
                        continue
                    self._rows_mem_bytes -= \
                        self._rows_bytes(self._rows_mem.pop(p))
                return self._assemble_locked(pairs)

    def _assemble_locked(self, pairs: set[tuple[str, str]],
                         ) -> dict[int, dict]:
        seg_rows: dict[int, dict] = {}
        for p in pairs:
            by = self._rows_mem.get(p)
            if by is None:
                continue
            self._rows_mem[p] = self._rows_mem.pop(p)  # LRU touch
            for seg, rows in by.items():
                seg_rows.setdefault(seg, {})[p] = rows
        return seg_rows

    def warm(self, top_terms: int = 256, distributed: bool = False,
             positions_top: int = 32,
             shuffle_partitions: int | None = None) -> int:
        """Preload the raw-rows cache with the highest-df (field, term)
        pairs over the default search fields.  ``distributed=True``
        additionally persists the shared postings relation in executor
        memory and materializes it, moving distributed-mode queries
        from parquet scans to in-memory columnar filters (min/max
        pruning on term still applies).

        The reference engine answers every query from an index held
        entirely in RAM (Hunt loads its ContextIndex at startup;
        hunt-searchengine's interpreter works on in-memory segment
        maps) — this is the bounded-memory analogue: the Zipf head
        accounts for most posting bytes touched by real query logs, so
        warming it moves steady-state latency to the warm percentiles
        without holding the whole index.  Returns pairs loaded.

        ``positions_top``: additionally DECODE postings + position
        streams of the ``positions_top`` highest-df pairs per default
        field into the cross-query decoded cache.  A phrase over
        ubiquitous terms otherwise pays the full position-stream decode
        on first touch (the sf10 cold tail: a Zipf-head bigram's first
        phrase query decoded ~30x slower than its steady state) — the
        Zipf head is exactly the set a cold heavy phrase will hit."""
        pairs: set[tuple[str, str]] = set()
        pos_pairs: set[tuple[str, str]] = set()
        if self._dict is not None:
            for f in self.default_fields:
                terms, dfs = self._dict.get(f, ([], np.zeros(0, np.int64)))
                if not terms:
                    continue
                top = np.argsort(dfs, kind="stable")[::-1][:top_terms]
                pairs |= {(f, terms[i]) for i in top}
                pos_pairs |= {(f, terms[i])
                              for i in top[:min(positions_top, len(top))]}
        else:
            # distributed dictionary: one small ordered head per field
            # (positions_top applies here too — the cold-phrase prewarm
            # must not silently no-op just because the dict spilled)
            for f in self.default_fields:
                rows = (self._terms_df
                        .filter(F.col("field") == f)
                        .orderBy(F.col("df").desc(), "term")
                        .select("term").limit(top_terms).collect())
                pairs |= {(f, r["term"]) for r in rows}
                pos_pairs |= {(f, r["term"]) for r in
                              rows[:min(positions_top, len(rows))]}
        if pairs:
            self._fetch_rows(pairs)
        if pos_pairs and positions_top:
            self._warm_positions(pos_pairs)
        if distributed:
            # serving posture for the session (an explicit opt-in: a
            # session used for BUILDS wants the opposite settings):
            # - AQE off: its runtime re-planning adds ~300 ms to these
            #   small 2-stage jobs (measured on the 30k bench index:
            #   730 -> 427 ms p50) — AQE pays off on big build
            #   shuffles, not on latency-critical point queries;
            # - shuffle partitions sized to the work: at bench scale
            #   scheduling 32 reduce tasks costs more than evaluating a
            #   handful of tiny groups serially (427 -> 300 ms at 8);
            #   at 1M+ docs per-group evaluation dominates scheduling,
            #   so the grouped-map fan-out wants ~one task per segment
            #   (8 partitions over 64 big segments serialized 8 groups
            #   per core and left 3/4 of the box idle).  A real cluster
            #   sizes this to its executor count.
            if shuffle_partitions is None:
                if self.n_docs >= 1_000_000:
                    par = self.spark.sparkContext.defaultParallelism
                    shuffle_partitions = min(len(self._segments),
                                             max(SERVING_SHUFFLE_PARTITIONS,
                                                 2 * par))
                else:
                    shuffle_partitions = SERVING_SHUFFLE_PARTITIONS
            self.spark.conf.set("spark.sql.adaptive.enabled", "false")
            self.spark.conf.set("spark.sql.shuffle.partitions",
                                str(shuffle_partitions))
            # encoded posting buffers are already varbyte-compressed —
            # columnar-cache compression on top costs a per-query
            # decompress pass and saves nothing; bigger cached batches
            # cut per-batch scan overhead (A/B at 10M: the persisted
            # scan+filter floor 246 -> 125 ms)
            self.spark.conf.set(
                "spark.sql.inMemoryColumnarStorage.compressed", "false")
            self.spark.conf.set(
                "spark.sql.inMemoryColumnarStorage.batchSize", "65536")
            with self._lock:
                if self._post_df_persisted:
                    self._post_df.unpersist()
                    self._post_df_persisted = False
                stamp = self._postings_stamp()
                # position streams stay OUT of the serving cache: no
                # query ships them (see _search_spark) — excluding them
                # here makes the persisted relation ~5x smaller and its
                # warm-time repartition ~5x cheaper
                base = self.spark.read.parquet(
                    os.path.join(self.index_dir, "postings")).drop(
                        "pos_vb", "block_pos_off")
                # hash-partitioned BY SEGMENT before persisting: the
                # per-query groupBy("segment") then satisfies its
                # clustered distribution straight from the cache — no
                # per-query exchange re-shipping encoded posting
                # buffers (at 10M the Zipf-head term's buffers are
                # tens of MB; re-shuffling them every query dominated
                # spark-mode p50), and cached-partition locality makes
                # segment→executor assignment sticky, so the
                # per-worker decoded/docs caches actually hit
                self._post_df = base.repartition(
                    max(1, int(shuffle_partitions)), "segment")
                self._post_df.persist()
                self._post_df_persisted = True
                self._post_df_stamp = stamp
            self._post_df.count()  # materialize the cache before serving
        return len(pairs)

    def _warm_positions(self, pairs: set[tuple[str, str]]) -> None:
        """Decode the given pairs' postings and position streams into
        the cross-query decoded cache (wand._POSTINGS_CACHE), keyed
        exactly as _search_local's SegmentData will key them — a later
        query's SegmentData over the same (segment, mtime, avgdl) view
        hits the warmed entries."""
        seg_rows = self._fetch_rows(pairs)
        self._decode_positions_parallel(seg_rows)

    def _decode_positions_parallel(
            self, seg_rows: dict[int, dict],
            only: set[tuple[str, str]] | None = None) -> None:
        """Decode postings + position streams into the cross-query cache
        (wand._POSTINGS_CACHE), keyed exactly as _search_local's
        SegmentData will key them, fanned out over a THREAD pool.

        Unlike segment evaluation (python-heavy small batches — r5
        measured threads 3x slower), the decode is big-array numpy
        (varbyte masks, cumsum, repeat) that releases the GIL, so
        threads scale it: the 3M cold-phrase decode dropped ~4x.
        ``only`` restricts to a subset of the fetched pairs."""
        from concurrent.futures import ThreadPoolExecutor

        docs_root = os.path.join(self.index_dir, "docs")
        post_root = os.path.join(self.index_dir, "postings")
        avgdl_key = tuple(sorted(self.avgdl.items()))

        def one(seg: int) -> None:
            raw = seg_rows[seg]
            docs_pdf = load_segment_docs(docs_root, seg)
            pdir = os.path.join(post_root, f"segment={seg}")
            mt = os.path.getmtime(pdir) if os.path.exists(pdir) else 0.0
            sd = SegmentData(None, docs_pdf,
                             cache_key=(post_root, seg, mt, avgdl_key),
                             raw=raw)
            sd._avgdl = self.avgdl  # salted merges rebuild block bounds
            for f, t in raw:
                if only is not None and (f, t) not in only:
                    continue
                sd.postings(f, t)
                sd.positions_flat(f, t)

        segs = sorted(seg_rows)
        if len(segs) <= 1:
            for s in segs:
                one(s)
            return
        with ThreadPoolExecutor(max_workers=min(16, len(segs))) as ex:
            list(ex.map(one, segs))

    #: a phrase term's position streams are pre-decoded in parallel
    #: before the serial segment loop when (a) the phrase's rarest term
    #: still has >= this many postings per segment (the candidate set
    #: is DENSE, so positions_for will fall back to the full decode
    #: anyway) and (b) the term's own stream is big enough to matter.
    PHRASE_PREWARM_CAND_PER_SEG = int(os.environ.get(
        "HAYOO_PHRASE_PREWARM_CAND", "64"))
    PHRASE_PREWARM_MIN_BYTES = int(os.environ.get(
        "HAYOO_PHRASE_PREWARM_BYTES", str(1 << 21)))

    def _prewarm_phrase_positions(self, ast, seg_rows: dict) -> None:
        """Cold-phrase tail killer (VERDICT r5 item 1): a heavy phrase's
        first touch decodes ubiquitous terms' whole position streams
        serially per segment.  Identify the (field, term) pairs whose
        decode is both INEVITABLE (dense candidates) and LARGE, and run
        those decodes across segments on the GIL-releasing thread pool
        first; the serial evaluation then hits the decoded cache."""
        if self._dict is None or not seg_rows:
            return
        phrases = self._collect_phrases(ast)
        if not phrases:
            return
        n_segs = max(1, len(seg_rows))
        heavy: set[tuple[str, str]] = set()
        for node in phrases:
            for f in self._expand_fields(node.field):
                tl, dfs = self._dict.get(f, ([], np.zeros(0, np.int64)))
                term_df = {}
                for t in node.terms:
                    i = bisect.bisect_left(tl, t)
                    term_df[t] = (int(dfs[i])
                                  if i < len(tl) and tl[i] == t else 0)
                if not term_df or (min(term_df.values()) / n_segs
                                   < self.PHRASE_PREWARM_CAND_PER_SEG):
                    continue  # sparse candidates: selective path wins
                heavy.update((f, t) for t in node.terms)
        if not heavy:
            return
        sizes = {p: 0 for p in heavy}
        for raw in seg_rows.values():
            for p in heavy:
                for r in raw.get(p, ()):
                    sizes[p] += len(r.pos_vb)
        only = {p for p, b in sizes.items()
                if b >= self.PHRASE_PREWARM_MIN_BYTES}
        if only:
            self._decode_positions_parallel(seg_rows, only=only)

    @staticmethod
    def _collect_phrases(node) -> list:
        out = []
        if isinstance(node, P.Phrase):
            out.append(node)
        elif isinstance(node, (P.And, P.Or)):
            for c in node.children:
                out.extend(SearchEngine._collect_phrases(c))
        elif isinstance(node, P.AndNot):
            out.extend(SearchEngine._collect_phrases(node.left))
            out.extend(SearchEngine._collect_phrases(node.right))
        return out

    def _search_local(self, ast, needed, m):
        """Serving-tier path: cached/pyarrow segment reads on the
        driver, fanned out over a thread pool (pyarrow releases the
        GIL; the numpy evaluation is batch work)."""
        from concurrent.futures import ThreadPoolExecutor

        idf_map = self._idf_map(needed)
        flat, flat_not = _flat_with_not(ast, self.field_weights)
        docs_root = os.path.join(self.index_dir, "docs")

        seg_rows = self._fetch_rows(set(needed))
        self._prewarm_phrase_positions(ast, seg_rows)
        is_phrase = isinstance(ast, P.Phrase)
        prunable = flat is not None or is_phrase
        if prunable:
            segs = sorted(seg_rows)
            if self._sharded:
                mine = set(self._segments)
                segs = [s for s in segs if s in mine]
        else:
            segs = self._segments

        post_root = os.path.join(self.index_dir, "postings")

        def one_segment(seg):
            raw = seg_rows.get(seg)
            if raw is None:
                if prunable:
                    return None
                raw = {}
            docs_pdf = load_segment_docs(docs_root, seg)
            # mtime in the cache key invalidates decoded postings when a
            # segment is rebuilt by an incremental update (a segment
            # whose docs all tokenized empty has no postings dir at all)
            pdir = os.path.join(post_root, f"segment={seg}")
            mt = os.path.getmtime(pdir) if os.path.exists(pdir) else 0.0
            # avgdl in the key: salted-term merges rebuild block bounds
            # under the CURRENT avgdl — an incremental update to OTHER
            # segments shifts global avgdl without touching this
            # segment's mtime, and stale lower bounds would make pruning
            # inadmissible in a long-lived process (ADVICE r1)
            avgdl_key = tuple(sorted(self.avgdl.items()))
            sd = SegmentData(None, docs_pdf,
                             cache_key=(post_root, seg, mt, avgdl_key),
                             raw=raw)
            ev = SegmentEvaluator(sd, idf_map, self.avgdl, self.ub_scale,
                                  self.field_weights, self.default_fields,
                                  self.date_fields)
            if flat is not None:
                ids, sc = ev.top_m_pruned(flat[0], flat[1], m,
                                          exclude=flat_not,
                                          filters=flat[2],
                                          phrases=flat[3])
            elif is_phrase:
                ids, sc = ev.top_m_phrase(ast, m)
            else:
                ids, sc = ev.evaluate(ast)
                ids, sc = ev._cut(ids, sc, m)
            return sd.url_take(ids), sc

        # parallelism split: the docs loads are pyarrow parquet reads
        # (GIL-releasing C++) — prefetch those on a pool; the evaluation
        # itself is small-batch numpy that HOLDS the GIL, where threads
        # only add contention (measured 6x slower threaded than serial)
        cold = [s for s in segs if not docs_loaded(docs_root, s)]
        if len(cold) > 1:
            with ThreadPoolExecutor(max_workers=min(8, len(cold))) as ex:
                list(ex.map(lambda s: load_segment_docs(docs_root, s), cold))
        out_urls: list = []
        out_scores: list = []
        # NOTE (r5, measured): a thread pool over segments is 3x SLOWER
        # even at 47k docs/segment (3M index: serial p50 194 ms vs
        # pooled 634 ms) — the evaluation's numpy calls stay too small
        # to release the GIL long enough, so threads convoy at every
        # scale tested.  Scale-out of one query's segments is the
        # distributed mode / segment-sharded serving processes, not
        # driver threads.
        with self._eval_gate:
            for seg in segs:
                res = one_segment(seg)
                if res is not None:
                    out_urls.extend(res[0])
                    out_scores.extend(res[1])
        if not out_urls:
            return []
        urls = np.asarray(out_urls, dtype=object)
        scores = np.asarray(out_scores, dtype=np.float64)
        order = np.lexsort((urls, -scores))[:m]
        return [(urls[i], float(scores[i])) for i in order]

    # ---------------- stored-field projection (Q12) ----------------

    def search_docs(self, query: str, k: int = P.PAGE_SIZE, page: int = 0,
                    mode: str | None = None,
                    fields: tuple[str, ...] = ("lang", "warc_ts"),
                    ) -> list[dict]:
        """Search + stored-field projection: each hit carries the
        requested doc-store columns (url/score always included) — the
        reference's description map + ``setSelectedFields``
        (hayooIndexer/src/Hayoo/Hunt/FctRankTable.hs:62-66, Q12).

        The doc join touches ONLY the top-k hits: local mode binary-
        searches the per-segment doc arrays (urls are doc_id-ordered ==
        url-ascending by construction); spark mode pushes an `url IN
        (k urls)` filter into the docs parquet scan (broadcast-size)."""
        hits = self.search(query, k=k, page=page, mode=mode)
        if not hits:
            return []
        docs_root = os.path.join(self.index_dir, "docs")
        meta: dict[str, dict] = {}
        if (mode or self.mode) == "local":
            urls = [u for u, _ in hits]
            for seg in self._segments:
                sd = load_segment_docs(docs_root, seg)
                if not sd.n_docs:
                    continue
                idx = np.searchsorted(sd.urls, urls)
                for u, j in zip(urls, idx):
                    if j < sd.n_docs and sd.urls[j] == u and u not in meta:
                        meta[u] = self._project_row(sd, int(j), fields)
        else:
            rows = (
                self.spark.read.parquet(docs_root)
                .filter(F.col("url").isin([u for u, _ in hits]))
                .select("url", *fields)
                .collect()
            )
            meta = {r["url"]: {f: r[f] for f in fields} for r in rows}
        return [{"url": u, "score": s, **meta.get(u, {})} for u, s in hits]

    def metrics(self) -> dict:
        """Snapshot of the serving metrics — the reference's /stats
        sample (collectStats, Metrics.hs:75-78): per-operation request
        count + latency distribution (mean/variance/sum/min/max and
        p50/p95/p99 over the recent window)."""
        return self._metrics.snapshot()

    @staticmethod
    def _project_row(sd, j: int, fields: tuple[str, ...]) -> dict:
        out = {}
        for f in fields:
            if f == "lang":
                out[f] = sd.langs[j]
            elif f == "warc_ts":
                out[f] = sd.warc_ts[j]
            elif f == "boost":
                out[f] = float(sd.boost[j])
            elif f.startswith("dl_") and f[3:] in sd.dls:
                out[f] = int(sd.dls[f[3:]][j])
            elif f in sd.extra:
                # declared stored columns (build_index store_cols),
                # e.g. the re-export merge's alt_uris/alt_modules
                v = sd.extra[f][j]
                out[f] = (list(v) if v is not None
                          and not isinstance(v, str)
                          and hasattr(v, "__len__") else v)
            else:
                raise KeyError(f"unknown stored field {f!r}")
        return out

    def _filter_only(self, ast: P.Node, m: int) -> list[tuple[str, float]]:
        """Queries with no scoring leaves (pure lang:/url:/range filters):
        direct pruned scan of the docs table, score 0, url order."""
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        cond = self._filter_cond(ast)
        if cond is None:
            return []
        rows = docs.filter(cond).orderBy("url").limit(m).select("url").collect()
        return [(r["url"], 0.0) for r in rows]

    def _filter_cond(self, node: P.Node):
        if isinstance(node, P.Term) and node.field in P.FILTER_FIELDS:
            return F.lower(F.col(node.field)) == node.term
        if isinstance(node, P.RangeFilter):
            if node.field in self.date_fields:
                lo, hi = P.iso_prefix_bounds(node.lo, node.hi)
                return (F.col(node.field) >= F.lit(lo)) & (
                    F.col(node.field) < F.lit(hi))
            if node.field not in P.RANGE_FIELDS:
                return F.lit(False)  # range on an undeclared field
            return (F.col(node.field) >= F.lit(node.lo)) & (
                F.col(node.field) < F.lit(node.hi))
        if isinstance(node, (P.And, P.Or)) and node.children:
            conds = [self._filter_cond(c) for c in node.children]
            if any(c is None for c in conds):
                return None
            out = conds[0]
            for c in conds[1:]:
                out = (out & c) if isinstance(node, P.And) else (out | c)
            return out
        if isinstance(node, P.AndNot):
            left = self._filter_cond(node.left)
            right = self._filter_cond(node.right)
            if left is None or right is None:
                return None
            return left & ~right
        return None

    def search_canned(self, name: str, params: dict | None = None,
                      k: int = P.PAGE_SIZE, page: int = 0,
                      mode: str | None = None) -> list[tuple[str, float]]:
        """Q14 drill-down: render a canned template (query/canned.py)
        and run it through the normal planner."""
        from . import canned
        return self.search(canned.render(name, **(params or {})),
                           k=k, page=page, mode=mode)

    # ---------------- autocomplete ----------------

    def autocomplete(self, prefix: str, n: int = 20,
                     fields: tuple[str, ...] | None = None,
                     ) -> list[tuple[str, float]]:
        """SCORED completion over the given fields' term dictionaries
        (default: the default search fields; reference completions
        carry scores, hayoo-server/src/Hayoo/App.hs:101-111):
        score(term) = Σ over fields of field_weight × df — the same
        weight folding the scorer applies, so completions rank like
        the results they lead to.

        Counted under the ``completions`` metric (the reference's
        mCompletions, App.hs:207-216); autocomplete_queries funnels
        through here so one user completion = one count."""
        with self._metrics.measure("completions"):
            return self._autocomplete_unmetered(prefix, n, fields)

    def _autocomplete_unmetered(self, prefix: str, n: int = 20,
                                fields: tuple[str, ...] | None = None,
                                ) -> list[tuple[str, float]]:
        search_fields = fields or self.default_fields
        if self._dict is not None:
            acc: dict[str, float] = {}
            for f in search_fields:
                d = self._dict.get(f)
                if d is None:
                    continue
                w = self.field_weights.get(f, 1.0)
                terms, dfs = d
                lo = bisect.bisect_left(terms, prefix)
                hi = bisect.bisect_left(terms, prefix + "￿")
                for i in range(lo, hi):
                    acc[terms[i]] = acc.get(terms[i], 0.0) + w * float(dfs[i])
            cands = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))
            return cands[:n]
        wmap = F.create_map(*[
            F.lit(x) for f in search_fields
            for x in (f, float(self.field_weights.get(f, 1.0)))])
        rows = (
            self._terms_df
            .filter(F.col("field").isin(list(search_fields))
                    & F.col("term").startswith(prefix))
            .groupBy("term")
            .agg(F.sum(wmap[F.col("field")] * F.col("df")).alias("score"))
            .orderBy(F.col("score").desc(), F.col("term"))
            .limit(n)
            .collect()
        )
        return [(r["term"], float(r["score"])) for r in rows]

    def autocomplete_queries(self, q: str, n: int = 20) -> list[str]:
        """FULL-QUERY completion — the reference autocomplete pipeline
        (hayooFrontend/src/Hayoo/Common.hs:402-415): a signature query
        returns its raw signature-context completions; otherwise the
        LAST word of the parsed query is completed against the term
        dictionary and each completion re-prints the WHOLE query
        (``H.printQuery <$> H.completeQueries q comps``)."""
        from .. import signature as SIG
        from . import parser as P_

        if SIG.is_signature_query(q):
            # handleSignatureQuery translates to a prefix query on the
            # signature context; completions come back raw
            try:
                sig = SIG.parse_norm(q.strip().strip('"'))
            except ValueError:
                return []
            pref = SIG.pretty_signature(sig)
            return [t for t, _ in
                    self.autocomplete(pref, n, fields=("signature",))]
        try:
            ast = P_.parse(q)
        except P_.QueryParseError:
            # unparsable input: degrade to completing the raw last word
            words = q.split()
            if not words:
                return []
            return [t for t, _ in self.autocomplete(
                words[-1].strip('"').lower(), n)]
        leaf = P_.last_word_leaf(ast)
        if leaf is None:
            return []
        word = getattr(leaf, "term", None) or getattr(leaf, "prefix", "")
        fields = None
        if leaf.field != P.DEFAULT_FIELD:
            if leaf.field not in self.field_weights:
                return []  # filter-only context: no term dictionary
            fields = (leaf.field,)
        comps = [t for t, _ in self.autocomplete(word, n, fields=fields)]
        return P_.complete_queries(ast, comps)
