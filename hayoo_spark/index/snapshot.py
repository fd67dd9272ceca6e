"""Atomic snapshot layout — the Iceberg-shim for plain-parquet indexes.

The incremental updater (update.py) deletes segment dirs in place and
rebuilds them; a concurrent reader can observe a half-updated index.
This module gives plain-parquet the property an Iceberg catalog would
provide (SURVEY.md §7 Phase 2 storage shim): versioned immutable index
dirs plus one atomically-replaced pointer file.

    index_root/
      CURRENT        text file naming the live version ("v000002")
      v000001/       a complete index layout (stats/docs/postings/...)
      v000002/

- a new version is a HARDLINK tree of the previous one (O(#files)
  metadata ops, no data copy — parquet files are immutable), then
  update_index mutates only the affected segments of the copy;
- the CURRENT pointer flips with os.replace (atomic on POSIX): readers
  resolve it once at engine construction and keep a consistent view of
  that version's files for their whole lifetime (snapshot isolation);
- old versions stay readable until pruned (keep >= 1 previous).

Reference analogue: the indexer's timestamped `cmdStoreIndex
"hayoo-ix.<ts>"` snapshots (hayooIndexer/src/Hayoo/Hunt/
IndexSchema.hs:167-176) — save points a server can load consistently.
"""

from __future__ import annotations

import os
import shutil

CURRENT = "CURRENT"


def is_snapshot_root(path: str) -> bool:
    return os.path.exists(os.path.join(path, CURRENT))


def resolve(path: str) -> str:
    """Index dir to read: follows CURRENT when `path` is a snapshot
    root, else `path` itself (plain layout)."""
    cur = os.path.join(path, CURRENT)
    if os.path.exists(cur):
        with open(cur) as fh:
            return os.path.join(path, fh.read().strip())
    return path


def versions(root: str) -> list[str]:
    return sorted(v for v in os.listdir(root)
                  if v.startswith("v") and v[1:].isdigit())


def _commit(root: str, version: str) -> None:
    tmp = os.path.join(root, CURRENT + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(version + "\n")
    os.replace(tmp, os.path.join(root, CURRENT))  # atomic flip


def _hardlink_tree(src: str, dst: str) -> None:
    """Recreate the directory tree with hardlinks to src's files —
    immutable parquet shares inodes; deletes in dst never touch src."""
    for dirpath, _dirnames, filenames in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for fn in filenames:
            os.link(os.path.join(dirpath, fn), os.path.join(out, fn))


def init_root(spark, pages_path: str, root: str, **build_kwargs) -> dict:
    """Cold-build version v000001 under a fresh snapshot root."""
    from .builder import build_index

    os.makedirs(root, exist_ok=True)
    v = "v000001"
    metrics = build_index(spark, pages_path, os.path.join(root, v),
                          **build_kwargs)
    _commit(root, v)
    metrics["version"] = v
    return metrics


def snapshot_update(spark, pages_path: str, root: str,
                    since_ts: str | None = None, changed_urls=None,
                    **build_kwargs) -> dict:
    """Incremental update as a new atomic snapshot version.

    Hardlinks the live version into v<N+1>, applies update_index there
    (only affected segments are unlinked and rebuilt), then flips
    CURRENT.  Readers opened before the flip keep the old version."""
    from .update import update_index

    vs = versions(root)
    if not vs:
        raise ValueError(f"{root} is not an initialized snapshot root")
    live = resolve(root)
    nxt = f"v{int(vs[-1][1:]) + 1:06d}"
    nxt_dir = os.path.join(root, nxt)
    shutil.rmtree(nxt_dir, ignore_errors=True)  # crashed prior attempt
    _hardlink_tree(live, nxt_dir)
    metrics = update_index(spark, pages_path, nxt_dir,
                           since_ts=since_ts, changed_urls=changed_urls,
                           **build_kwargs)
    _commit(root, nxt)
    metrics["version"] = nxt
    return metrics


def prune(root: str, keep: int = 2) -> list[str]:
    """Drop all but the newest `keep` versions (never the live one).
    Returns removed version names."""
    vs = versions(root)
    live = os.path.basename(resolve(root))
    removed = []
    for v in vs[:-keep] if keep > 0 else vs:
        if v == live:
            continue
        shutil.rmtree(os.path.join(root, v), ignore_errors=True)
        removed.append(v)
    return removed
