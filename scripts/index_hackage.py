#!/usr/bin/env python3
"""spark-submit entry: the composed gen-2 pipeline (SURVEY.md §3.2) —
the reference's ``newHayooIndexer --cabal index.tar.gz --hoogle
hoogle.tar.gz`` flow.

    spark-submit --py-files hayoo_spark.zip scripts/index_hackage.py \
        --hoogle /data/hoogle-tars --cabal /data/index-tars \
        --index /data/ix --commands /data/cmds

Reads directories of tar archives (cabal metadata + hoogle exports),
builds the 18-context HAYOO_FIELDS index with package-rank document
weights, and optionally emits the Hunt command stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hoogle", required=True,
                    help="directory of hoogle-export tar archives")
    ap.add_argument("--cabal", required=True,
                    help="directory of cabal-index tar archives")
    ap.add_argument("--index", required=True)
    ap.add_argument("--commands", default=None,
                    help="also write the Hunt command stream here")
    ap.add_argument("--segments", type=int, default=32)
    ap.add_argument("--indexed-ts", default="2026-01-01T00:00:00",
                    help="deterministic indexed/upload date-context "
                         "stamp (fmtDateXmlSchema shape)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from hayoo_spark.session import get_spark
        spark = get_spark(app_name="hayoo-index-hackage", cores=args.cores)

    from hayoo_spark.pipeline import index_hackage

    metrics = index_hackage(spark, args.hoogle, args.cabal, args.index,
                            commands_dir=args.commands,
                            indexed_ts=args.indexed_ts,
                            n_segments=args.segments)
    print(json.dumps(metrics, default=str))


if __name__ == "__main__":
    sys.exit(main())
