"""Page-fetch seam (SURVEY.md §2 S1/S5 fetch half).

The reference's tarball/page fetch is network I/O (hayooCrawler,
TarUtil's download step).  This sandbox has no network, so — like the
multimodal decode kernels — the TRANSPORT is a pluggable function and
the default raises, while the Spark-side plumbing is real and tested:

- the frontier repartitions BY HOST, so one task owns a host's whole
  queue — the politeness/rate-limit unit of every real crawler (and
  the natural partition key at 10^12 urls: hosts are the skew axis,
  and a host's fetches must serialize anyway);
- within a task, urls are fetched in deterministic (host, url) order,
  Arrow batch in / Arrow batch out;
- the output row carries (url, status, html) and feeds
  ``index.builder.prepare_docs`` / ``sinks.commands`` directly.

A real deployment passes ``fetcher=lambda url: (status, bytes)`` built
on its HTTP client; tests use a deterministic fake.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_SCHEMA = "url string, status int, html binary, attempts int"

#: statuses worth retrying (rate-limit + transient server errors)
RETRY_STATUSES = (429, 500, 502, 503, 504)


def _no_network(url: str):
    raise NotImplementedError(
        "no HTTP transport in this environment — pass fetcher=...")


def fetch_pages(frontier: DataFrame, url: str = "url",
                fetcher: Callable[[str], tuple[int, bytes]] = _no_network,
                partitions: int | None = None,
                max_retries: int = 2,
                backoff: Callable[[int], None] | None = None,
                ) -> DataFrame:
    """Fetch every frontier url through ``fetcher``, one host per task.

    Transient failures — a retryable status (RETRY_STATUSES) or an
    ``OSError``-family exception from the transport — are retried up to
    ``max_retries`` times with ``backoff(attempt)`` between tries (a
    seam: the default is nothing, a deployment passes its sleep /
    token-bucket; it runs INSIDE the host's task, so backoff never
    blocks other hosts).  The last status is emitted with the attempt
    count; exceptions after the final retry surface as status 0 rows
    rather than failing the whole partition (one dead url must not
    kill a billion-row crawl batch)."""

    host = F.lower(F.regexp_extract(F.col(url), r"^[a-zA-Z]+://([^/:?#]+)", 1))
    df = frontier.select(F.col(url).alias("url"), host.alias("_host"))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n, "_host")

    def fetch_one(u: str) -> tuple[int, bytes, int]:
        status, body = 0, b""
        for attempt in range(max_retries + 1):
            if attempt and backoff is not None:
                backoff(attempt)
            try:
                status, body = fetcher(u)
            except OSError:
                status, body = 0, b""
                continue
            if int(status) not in RETRY_STATUSES:
                break
        return int(status), bytes(body), attempt + 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.sort_values(["_host", "url"], kind="mergesort")
            out = {"url": [], "status": [], "html": [], "attempts": []}
            for u in pdf["url"]:
                status, body, attempts = fetch_one(u)
                out["url"].append(u)
                out["status"].append(status)
                out["html"].append(body)
                out["attempts"].append(attempts)
            if out["url"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FETCH_SCHEMA)
