"""Structured-Streaming operators over the events stream.

The reference has no true streaming (SURVEY.md §2.7 — its incremental
mode is batch micro-update, mapped in index/update.py).  A large-scale
training-data pipeline does need streaming analytics over event
streams, so this module adds the two canonical shapes Spark-first:

- **watermarked windowed aggregation**: `readStream -> withWatermark ->
  groupBy(window(ts), key) -> agg` — late data handled by the
  watermark, state bounded by window retention;
- **custom stateful sessionization** via ``applyInPandasWithState``:
  per-user session counting with an inactivity gap, state = (last event
  timestamp, session count, event count) — the streaming twin of the
  batch ``q_events_sessionize`` contract entry (window lag + running
  sum), tested to agree with it when the stream is drained.

Both run with ``trigger(availableNow=True)`` in tests so results are
deterministic; on a real cluster the same code runs continuously.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches q_events_sessionize

SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])

# state: last event micros, sessions so far, events so far
SESSION_STATE_SCHEMA = StructType([
    StructField("last_us", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])


def windowed_event_counts(stream: DataFrame, window: str = "1 day",
                          watermark: str = "2 days") -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data
    tolerance = `watermark`.  Works on a batch DataFrame too (the
    window/agg exprs are identical) — tested against that twin."""
    src = stream
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value") * 100).cast("bigint").alias("sum_value_x100"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n",
                "sum_value_x100")
    )


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user stateful fold: count sessions split by >30 min gaps.

    Events are sorted within the micro-batch; state carries the fold
    across batches (the reference's T12 stateful line->doc fold shape,
    newHayooIndexer/src/ProcessLine.hs:17-92, generalized to streams).
    """
    (user_id,) = key
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return
    pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
    if state.exists:
        last_us, n_sessions, n_events = state.get
    else:
        last_us, n_sessions, n_events = None, 0, 0
    for t in us:
        if last_us is None or t - last_us > SESSION_GAP_US:
            n_sessions += 1
        last_us = int(t)
        n_events += 1
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [user_id],
                        "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """Streaming per-user session counts (update mode): emits the
    running (n_sessions, n_events) per user each micro-batch."""
    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
