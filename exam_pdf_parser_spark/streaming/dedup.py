"""Streaming deduplication over a documents-shaped ingest feed
(url, warc_ts, html, text, lang) — the web-crawl ingestion twin of the
batch ``operators/dedupe`` family.

Two tiers, both keyed on the content hash (md5 of text, same key as
batch ``exact_dup_assignment``):

  * ``streaming_exact_dedup`` — declarative:
    ``dropDuplicatesWithinWatermark`` on the content hash.  State is
    bounded by the event-time watermark — the web-ingest assumption is
    that duplicates of a page arrive close together in crawl time
    (same crawl wave / mirror burst); beyond the horizon the row ages
    out of state.  At 10^12-doc scale this is the only tractable
    contract: unbounded exact dedup belongs to the batch layer
    (``exact_dup_assignment``), streaming handles the in-window burst.
  * ``first_seen_filter`` — custom stateful operator
    (``applyInPandasWithState``, same machinery as sessionization):
    emits each content hash's FIRST row with a running duplicate
    count, and re-emits updated counts as later duplicates arrive —
    provenance for "which url was the canonical first fetch".
    State evicts on a processing-time timeout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType, TimestampType,
)

DOCS_STREAM_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_exact_dedup(stream: DataFrame,
                          watermark: str = "24 hours") -> DataFrame:
    """Keep the first row per content hash within the watermark
    horizon; state is dropped once event time passes the horizon, so
    memory is bounded by (ingest rate × horizon), never by corpus
    size.

    NULL text (quarantine-bound rows) is never a duplicate — same
    contract as batch ``curation.curate``.  dropDuplicatesWithinWatermark
    treats NULL keys as equal, so null-hash rows are routed AROUND the
    dedup (a filtered union) instead of through it."""
    hashed = (
        stream
        .withColumn("content_hash", F.md5("text"))
        .withWatermark("warc_ts", watermark)
    )
    deduped = (
        hashed.filter(F.col("content_hash").isNotNull())
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    passthrough = hashed.filter(F.col("content_hash").isNull())
    return deduped.unionByName(passthrough)


FIRST_SEEN_SCHEMA = StructType([
    StructField("content_hash", StringType()),
    StructField("first_url", StringType()),
    StructField("first_ts", TimestampType()),
    StructField("n_duplicates", LongType()),
])

_STATE_SCHEMA = "first_url string, first_us long, n long"


def _first_seen(key, pdfs, state: GroupState):
    content_hash = key[0]
    if state.hasTimedOut:
        state.remove()
        return

    first_url, first_us, n = (
        state.get if state.exists else (None, None, 0))
    # "first" = running min over (ts, url) — order-free, so no sort is
    # needed regardless of file-arrival order (same determinism as a
    # W1/W2 explicit key, without the O(n log n))
    for pdf in pdfs:
        for ts, url in zip(pdf["warc_ts"], pdf["url"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if first_url is None or (us, url) < (first_us, first_url):
                first_url, first_us = url, us
            n += 1
    state.update((first_url, first_us, n))
    state.setTimeoutDuration(300_000)
    yield pd.DataFrame([{
        "content_hash": content_hash,
        "first_url": first_url,
        "first_ts": pd.Timestamp(first_us, unit="us"),
        "n_duplicates": int(n - 1),
    }])


def first_seen_filter(stream: DataFrame) -> DataFrame:
    """Per-content-hash canonical-first tracking with duplicate counts
    (update-mode output: a hash's row refreshes as duplicates accrue)."""
    return (
        stream
        .withColumn("content_hash", F.md5("text"))
        .select("content_hash", "url", "warc_ts")
        .groupBy("content_hash")
        .applyInPandasWithState(
            _first_seen,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
