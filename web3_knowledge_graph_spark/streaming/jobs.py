"""Streaming jobs over the events table.

The reference has no streaming engine — incremental batch with watermark
cursors (SURVEY.md §2.11; e.g. block cursors at /root/reference/pipelines/
scraping/ens/scrape.py:152-153, tweet since_id at postProcessing/
twitterThreads/process.py:20,162) plus an *optional* push path via Alchemy
webhooks (helpers/Alchemy.py:354-460). This module supplies the Spark-native
upgrade of that push path:

  * windowed_event_counts — readStream → watermark → tumbling-window agg.
    Late data within the watermark updates its window; later-than-watermark
    rows drop, mirroring the reference's idempotent-MERGE tolerance.
  * sessionize_stream — custom stateful operator (applyInPandasWithState):
    per-user session windows with a 30-min inactivity gap. Sessions close
    when a later event exceeds the gap; the trailing open session stays in
    state (emitted on a later trigger once closed).

Batch equivalents (driver_queries.q_events_hourly / q_sessionization) carry
the DuckDB oracle checks; tests drive these streaming versions with the
availableNow trigger against the same parquet input and compare.

Scale notes: state is partitioned by user_id (the groupBy key); watermarks
bound state size; at 10^12-event scale the windowed agg is a standard
shuffle-once stateful agg and the session operator holds one (last_ts,
session_start, count) triple per active user.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SESSION_GAP_S = 1800

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Parquet-directory stream source (one file per micro-batch is the
    test mode; in production this is a Kafka/webhook-backed source)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count + exact cents-sum per (window, event_type).

    The watermark bounds the agg state: windows older than max(ts) −
    watermark finalize and stop accepting late rows.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user stateful session assembly. Events inside a trigger arrive
    unordered → sort; gap > SESSION_GAP_S closes the running session."""
    (user_id,) = key
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = -1
        n = 0
    out: list[dict[str, Any]] = []
    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us < 0:
                start_us, last_us, n = ts_us, ts_us, 1
            elif ts_us - last_us > SESSION_GAP_S * 1_000_000:
                out.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us * 1000),
                        "session_end": pd.Timestamp(last_us * 1000),
                        "n_events": n,
                    }
                )
                start_us, last_us, n = ts_us, ts_us, 1
            else:
                last_us = ts_us
                n += 1
    state.update((start_us, last_us, n))
    yield pd.DataFrame(
        out,
        columns=["user_id", "session_start", "session_end", "n_events"],
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: session windows with a 30-min gap via
    applyInPandasWithState. Emits each session when a subsequent event
    closes it; the open tail session lives in state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain the stream with the availableNow trigger into an in-memory
    sink and return the result as a batch DataFrame (test harness; a
    production job writes to an Iceberg/parquet sink with checkpointing).
    Use output_mode='complete' for aggregations (final window states) and
    'append' for the stateful session operator."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
