#!/usr/bin/env python3
"""spark-submit entry: build (or resume) an index.

    spark-submit --py-files hayoo_spark.zip scripts/build_index.py \
        --pages /data/pages --index /data/index --segments 256 \
        --segments-per-batch 32 --resume

On a cluster, drop the --master handling (spark-submit provides the
session); locally this self-bootstraps a local[N] session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python scripts/...` runs: make the repo root importable
# (spark-submit --py-files hayoo_spark.zip provides it on a cluster)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--segments-per-batch", type=int, default=None)
    ap.add_argument("--salt-threshold", type=int, default=4096)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--fields", default=None,
        help='context schema as JSON, e.g. \'[{"name":"title","weight":2.5,'
             '"default":true,"source":"title"},{"name":"text","weight":1.0,'
             '"default":true,"source":"body"}]\' (default: single body field)')
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from hayoo_spark.session import get_spark
        spark = get_spark(app_name="hayoo-build", cores=args.cores)

    from hayoo_spark.index.builder import build_index
    from hayoo_spark.index.fields import DEFAULT_FIELDS, FieldSpec

    fields = DEFAULT_FIELDS
    if args.fields:
        fields = tuple(
            FieldSpec(f["name"], float(f.get("weight", 1.0)),
                      bool(f.get("default", True)), f.get("source", "body"))
            for f in json.loads(args.fields))

    metrics = build_index(
        spark, args.pages, args.index,
        n_segments=args.segments,
        segments_per_batch=args.segments_per_batch,
        salt_df_threshold=args.salt_threshold,
        n_salts=args.n_salts,
        resume=args.resume,
        fields=fields,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    sys.exit(main())
