"""Structured-Streaming parity: the streaming operators drained over a
file stream agree with their batch twins on the same data."""

import os

import pandas as pd
import pytest

from hayoo_spark import streaming


@pytest.fixture(scope="module")
def events_pdf():
    """Deterministic two-drop event stream: 6 users, gaps straddling
    the 30-min session threshold, late-ish rows in drop 2."""
    rows = []
    base = pd.Timestamp("2024-03-01 00:00:00")
    eid = 0
    for u in range(6):
        t = base + pd.Timedelta(minutes=u)
        for k in range(10):
            # every 3rd event jumps > 30 min -> new session
            step = pd.Timedelta(minutes=45 if k % 3 == 0 and k else 7)
            t = t + step
            rows.append((eid, u, t, "click" if k % 2 else "view",
                         round(0.5 * k + u, 2)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type", "value"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, events_pdf):
    d = tmp_path_factory.mktemp("estream")
    # two chronological drops (a file stream delivers file-at-a-time)
    half = len(events_pdf) // 2
    events_pdf.iloc[:half].to_parquet(d / "drop-0.parquet", index=False)
    events_pdf.iloc[half:].to_parquet(d / "drop-1.parquet", index=False)
    return str(d)


def _drain(spark, q_name, stream_df, mode):
    q = (stream_df.writeStream.format("memory").queryName(q_name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(q_name).toPandas()


def test_windowed_counts_match_batch(spark, events_pdf, stream_dir,
                                     tmp_path_factory):
    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    got = _drain(spark, "win_counts",
                 streaming.windowed_event_counts(stream, window="1 hour"),
                 "complete")
    batch_src = spark.createDataFrame(events_pdf)
    want = streaming.windowed_event_counts(batch_src, window="1 hour") \
        .toPandas()
    key = ["w_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_sessionize_stream_matches_batch_fold(spark, events_pdf, stream_dir):
    """Drained streaming sessionization == the batch window-lag
    sessionize (the q_events_sessionize contract query) per user."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    got = _drain(spark, "sess_stream", streaming.sessionize_stream(stream),
                 "update")
    # update mode emits one row per user per touching micro-batch:
    # n_events is monotone per user, so the max-n_events row is the
    # drained total (row order from the memory sink is not a contract)
    got = (got.loc[got.groupby("user_id")["n_events"].idxmax()]
           .sort_values("user_id").reset_index(drop=True))

    ev = spark.createDataFrame(events_pdf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = F.when(us - F.lag(us).over(w) > 1_800_000_000, 1).otherwise(0)
    sess = ev.withColumn("new_sess", F.coalesce(gap, F.lit(0))) \
        .withColumn("sess_id", F.sum("new_sess").over(w))
    want = (sess.groupBy("user_id")
            .agg((F.max("sess_id") + 1).alias("n_sessions"),
                 F.count("*").alias("n_events"))
            .toPandas().sort_values("user_id").reset_index(drop=True))
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_sessions"].tolist() == want["n_sessions"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
