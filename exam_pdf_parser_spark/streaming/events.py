"""Structured Streaming over the ``events`` table shape (SURVEY.md
§2.10 — the reference is batch-only; this is the cheap extension the
survey planned, giving the engine a streaming ingestion path for the
same relational operators).

Patterns covered:
  * file-source streaming read with declared schema;
  * event-time window aggregation with a watermark (late-data bound);
  * the sliding-window rate-limit analogue (W10,
    src/rate_limit.py:87-119) as a windowed count per key;
  * a custom stateful operator (per-user sessionization) via
    ``applyInPandasWithState`` — the Spark-native replacement for the
    reference's in-memory job store (src/server.py:52-69).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed counts; late rows beyond the watermark are
    dropped (the correctness contract for out-of-order WARC-style
    feeds)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("bigint"))
             .alias("value_c"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "value_c")
    )


def rate_limit_counts(stream: DataFrame,
                      window: str = "60 seconds",
                      slide: str = "10 seconds",
                      limit: int = 100) -> DataFrame:
    """W10 re-expression: per-user sliding-window request counts with
    an over-limit flag (the reference's deque-based limiter,
    src/rate_limit.py:87-119, as a declarative plan)."""
    return (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n",
                (F.col("n") > limit).alias("over_limit"))
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_events", IntegerType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
])

_STATE_SCHEMA = "n long, start_ts long, last_ts long"
SESSION_GAP_S = 1800


def _sessionize(key, pdfs, state: GroupState):
    """Emit a session row whenever the 30-min gap elapses (processing-
    time timeout variant for determinism-friendly testing)."""
    user_id = key[0]
    if state.hasTimedOut:
        n, start_us, last_us = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id,
            "session_events": int(n),
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
        }])
        return

    n, start_us, last_us = (state.get if state.exists else (0, None, None))
    # micro-batch rows arrive in file order, not time order — sort
    # before the gap walk (same explicit-ordering rule as W1/W2)
    all_ts = sorted(
        int(pd.Timestamp(ts).value // 1000)
        for pdf in pdfs for ts in pdf["ts"]
    )
    for us in all_ts:
        if last_us is not None and us - last_us > SESSION_GAP_S * 1_000_000:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_events": int(n),
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
            }])
            n, start_us = 0, us
        if start_us is None:
            start_us = us
        n += 1
        last_us = us
    state.update((n, start_us, last_us))
    state.setTimeoutDuration(60_000)


def sessionize(stream: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user session aggregation."""
    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "update",
                  timeout_s: int = 120, until_rows: int | None = None):
    """Drive a streaming plan into an in-memory sink (tests/demos).

    Stateful queries with processing-time timeouts never self-terminate
    under ``availableNow`` — Spark keeps running empty batches to fire
    pending state timeouts — so callers that know their expected output
    size pass ``until_rows``: the loop polls the memory table and
    returns as soon as that many rows landed, instead of burning the
    full timeout.

    Caveats: ``until_rows`` counts SINK rows — an update-mode sink
    appends one row per re-emission, so a key updated across several
    micro-batches counts several times; size the input to one batch
    (or count expected emissions, not keys) when using it.  The query
    may still be running on return — callers own ``q.stop()``."""
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(name).outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    spark = stream_df.sparkSession
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if q.awaitTermination(2):
            break
        if until_rows is not None:
            n = spark.sql(f"SELECT count(*) AS c FROM {name}").first()["c"]
            if n >= until_rows:
                break
    return q
