"""Streaming jobs vs their batch equivalents on the same input.

The batch versions (driver_queries.q_events_hourly / q_sessionization) are
DuckDB-oracle-checked; these tests pin the streaming versions to them.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from web3_knowledge_graph_spark.streaming import jobs as J

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split across several parquet files written in time order with
    distinct mtimes → ordered micro-batches (maxFilesPerTrigger=1 exercises
    true incremental state; the file source orders by modification time)."""
    import time as _time

    d = tmp_path_factory.mktemp("events_stream")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    bounds = ev.selectExpr(
        "percentile_approx(ts, array(0.25, 0.5, 0.75))"
    ).first()[0]
    cuts = [None, *bounds, None]
    for i in range(4):
        part = ev
        if cuts[i] is not None:
            part = part.where(F.col("ts") > F.lit(cuts[i]))
        if cuts[i + 1] is not None:
            part = part.where(F.col("ts") <= F.lit(cuts[i + 1]))
        part.coalesce(1).write.mode("append").parquet(str(d))
        _time.sleep(1.1)
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = J.windowed_event_counts(J.read_event_stream(spark, events_dir))
    got = J.run_available_now(stream, "win_counts", output_mode="complete")
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("total"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b


def test_sessionize_stream_matches_batch(spark, events_dir):
    """Closed sessions from the stateful operator == batch sessions minus
    each user's trailing (still-open) session."""
    stream = J.sessionize_stream(J.read_event_stream(spark, events_dir))
    got = J.run_available_now(stream, "sessions", output_mode="append")
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsc = F.col("ts").cast("timestamp")
    gap = F.unix_micros(tsc) - F.unix_micros(F.lag(tsc).over(w))
    sess = (
        ev.withColumn(
            "_new", F.when(gap.isNull() | (gap > J.SESSION_GAP_S * 1_000_000), 1).otherwise(0)
        )
        .withColumn(
            "sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    # drop each user's last (open) session — stream holds it in state
    last = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sess.join(last, "user_id").where(F.col("sid") != F.col("max_sid"))
    g = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    b = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed.collect()
    }
    assert g == b
    assert len(g) > 0