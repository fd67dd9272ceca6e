"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as ``binary`` columns next to a metadata
struct; all transforms are mapInPandas over Arrow batches so payload
bytes never round-trip through per-row Python.  The actual media
decoding (PIL/ffmpeg-class work) is NOT available in this environment —
decode kernels are stubbed behind clearly-marked seams
(`NotImplementedError` or a deterministic fake) while the Spark-side
contract — schema, batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:long>"
)

FEATURE_SCHEMA = "url string, kind string, n_bytes long, feature array<float>"


def attach_metadata(df: DataFrame, payload: str = "payload") -> DataFrame:
    """Derive cheap metadata JVM-side (no decode): byte length, digest."""
    return df.withColumn("n_bytes", F.length(F.col(payload)).cast("long")) \
        .withColumn("digest", F.md5(F.col(payload)))


def real_decode_image(payload: bytes) -> "np.ndarray":
    """Seam for a real decoder (PIL / turbojpeg).  Not available here."""
    raise NotImplementedError(
        "media decoding libraries are not installed in this environment; "
        "plug PIL/libjpeg here — the Spark plumbing around this seam is "
        "complete and tested with fake_feature below")


def fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: md5 -> dim floats in
    [0,1).  Lets the full pipeline (batching, schema, joins) be tested
    byte-deterministically without media libs."""
    h = hashlib.md5(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(
    media: DataFrame,
    kernel: Callable[[bytes], np.ndarray] = fake_feature,
    payload: str = "payload",
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, float vectors
    out.  Swap `kernel` for a real decoder at deployment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(bytes(b)).tolist() for b in pdf[payload]]
            yield pd.DataFrame({
                "url": pdf["url"],
                "kind": pdf["kind"],
                "n_bytes": pdf[payload].map(len).astype("int64"),
                "feature": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


def payload_stats(df: DataFrame, key: str = "doc_id",
                  payload: str = "payload",
                  chunk_bytes: int = 1024) -> DataFrame:
    """Cheap per-payload statistics over a binary column via
    mapInPandas (the exact batch shape a real decoder uses): byte
    length, content digest, and the chunk count a chunked feature
    extractor would fan out to.  Fully SQL-expressible, so this is the
    oracle-checked probe of the multimodal plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [bytes(b) for b in pdf[payload]]
            yield pd.DataFrame({
                key: pdf[key],
                "n_bytes": [len(b) for b in raw],
                "digest": [hashlib.md5(b).hexdigest() for b in raw],
                "n_chunks": [(len(b) + chunk_bytes - 1) // chunk_bytes
                             for b in raw],
            })

    return df.select(key, payload).mapInPandas(
        run, f"{key} long, n_bytes long, digest string, n_chunks long")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (explode of a sequence on duration metadata) — the decode of each
    frame is the stubbed kernel.  Shows the partitioning/fan-out shape:
    frames of one video stay in one task unless repartitioned."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"),
                                 F.lit(every_ms))))
        .select("url", "frame_ts_ms", "payload")
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + (i % 5) * 32)
        rows.append((
            f"https://media.example.org/{kind}/{i:05d}",
            kind, bytearray(payload),
            {"mime": f"{kind}/x-fake", "width": 64 + i, "height": 48 + i,
             "duration_ms": 3000 + 250 * i},
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
