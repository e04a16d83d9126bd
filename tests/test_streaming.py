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
    """Stream output == batch sessions closed by a later event, PLUS each
    trailing session whose end + gap fell behind the final event-time
    watermark (EventTimeTimeout flush). Only trailing sessions still inside
    the watermark horizon may remain unemitted (held in state)."""
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
    last = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    sess = sess.join(last, "user_id")
    g = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }
    rows = sess.collect()
    import pandas as pd

    max_ms = max(pd.Timestamp(r.session_end).value for r in rows) // 1_000_000
    wm_final_ms = max_ms - 10 * 60 * 1000  # watermark_delay default "10 minutes"
    closed, maybe_open = set(), set()
    for r in rows:
        key = (r.user_id, r.session_start, r.session_end, r.n_events)
        end_ms = pd.Timestamp(r.session_end).value // 1_000_000
        if r.sid != r.max_sid:
            closed.add(key)  # closed by a later event → must be emitted
        elif end_ms + J.SESSION_GAP_S * 1000 < wm_final_ms:
            closed.add(key)  # trailing but expired → timeout must flush it
        else:
            maybe_open.add(key)  # inside the horizon: may stay in state
    assert closed <= g
    assert g <= closed | maybe_open
    assert len(g) > 0


def test_sessionize_flushes_churned_user(spark, tmp_path):
    """A user whose last event is long past never sends another event; the
    event-time timeout must still flush their session once later traffic
    (from OTHER users) advances the watermark."""
    import pandas as pd

    d = tmp_path / "churn_stream"
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    early = [(1, t0, 7, "view", 1.0, "{}"), (2, t0 + pd.Timedelta(minutes=5), 7, "view", 1.0, "{}")]
    late = [(3, t0 + pd.Timedelta(hours=6), 8, "view", 1.0, "{}")]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    import time as _time

    for batch in (early, late):
        spark.createDataFrame(
            pd.DataFrame(batch, columns=cols), schema=J.EVENTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(str(d))
        _time.sleep(1.1)
    got = J.run_available_now(
        J.sessionize_stream(J.read_event_stream(spark, str(d))),
        "churn_sessions",
        output_mode="append",
    )
    rows = {(r.user_id, r.n_events) for r in got.collect()}
    assert (7, 2) in rows  # churned user's session flushed by timeout


def test_extract_mentions_stream_matches_batch(spark, tmp_path):
    """Streaming flagship extract (foreachBatch over a pages file stream)
    must emit exactly the batch extract_stage result over the same corpus —
    per-page stateless work, so micro-batching cannot change semantics."""
    from web3_knowledge_graph_spark.fixtures import corpus
    from web3_knowledge_graph_spark.plans.pipeline import extract_stage

    pages_dir = tmp_path / "pages_stream"
    pages = corpus.pages_df(spark, 120, partitions=4)
    pages.write.mode("overwrite").parquet(str(pages_dir))
    alias_dict = spark.createDataFrame(corpus.alias_dict_pdf())

    q = J.extract_mentions_stream(
        spark,
        str(pages_dir),
        alias_dict,
        str(tmp_path / "mentions_out"),
        str(tmp_path / "mentions_ckpt"),
    )
    q.awaitTermination()

    got = {
        tuple(r)
        for r in J.read_run_output(spark, str(tmp_path / "mentions_out"))
        .select("url", "kind", "value", "n")
        .collect()
    }
    want = {
        tuple(r)
        for r in extract_stage(spark.read.parquet(str(pages_dir)), alias_dict)
        .select("url", "kind", "value", "n")
        .collect()
    }
    assert got == want and len(want) > 0

def test_dedup_stream_one_row_per_fingerprint(spark, tmp_path):
    """Streaming exact dedup emits each content fingerprint exactly once
    and covers the same distinct-fingerprint set as the batch operator."""
    from pyspark.sql import functions as F

    from web3_knowledge_graph_spark.fixtures import corpus

    pages_dir = tmp_path / "dedup_stream"
    pages = corpus.pages_df(spark, 80, partitions=2)
    # plant duplicates: re-append half the corpus under different urls
    dups = pages.limit(40).withColumn(
        "url", F.concat(F.lit("mirror-"), F.col("url"))
    )
    pages.unionByName(dups).write.mode("overwrite").parquet(str(pages_dir))

    got = J.run_available_now(
        J.dedup_stream(spark, str(pages_dir)), "dedup_stream_t"
    )
    rows = got.select("fingerprint").collect()
    fps = [r.fingerprint for r in rows]
    assert len(fps) == len(set(fps))  # one emission per fingerprint
    want = {
        r.fp
        for r in spark.read.parquet(str(pages_dir))
        .select(F.md5(F.lower(F.col("text"))).alias("fp"))
        .distinct()
        .collect()
    }
    assert set(fps) == want and len(want) > 0


def test_sessionize_multi_chunk_group(spark, tmp_path):
    """A user whose in-trigger events span MULTIPLE Arrow chunks must not
    lose events: sorting per chunk misread earlier events in a later
    chunk as late-and-droppable (regression for the per-chunk sort bug)."""
    import pandas as pd

    d = tmp_path / "chunk_stream"
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (i, t0 + pd.Timedelta(minutes=i), 7, "view", 1.0, "{}") for i in range(25)
    ]
    # SCRAMBLE the file order (descending ts): the first Arrow chunk then
    # holds the LATEST timestamps, so a per-chunk sort would drop every
    # event of the later chunks as "late"
    rows = rows[::-1]
    # a much-later other-user event pushes the watermark past user 7's
    # session end + gap so the trailing session flushes
    rows.append((99, t0 + pd.Timedelta(hours=6), 8, "view", 1.0, "{}"))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=cols), schema=J.EVENTS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(str(d))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        got = J.run_available_now(
            J.sessionize_stream(J.read_event_stream(spark, str(d))),
            "chunk_sessions",
            output_mode="append",
        )
        sessions = {
            (r.user_id, r.n_events) for r in got.collect() if r.user_id == 7
        }
        assert sessions == {(7, 25)}  # one session, EVERY event counted
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_trending_stream_matches_batch_topk(spark, tmp_path):
    """Streaming trending top-k == batch windowed-count rank, for every
    window the watermark finalized; each finalized window appears exactly
    once across epochs (the append-mode emit-once contract the per-epoch
    rank relies on)."""
    import pandas as pd
    from pyspark.sql import Window

    d, out, ckpt = (
        str(tmp_path / "ev"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    # hour 0: 5 clicks, 3 views, 1 error; hour 1: 4 errors, 2 signups
    for n, et, h in ((5, "click", 0), (3, "view", 0), (1, "error", 0),
                     (4, "error", 1), (2, "signup", 1)):
        for i in range(n):
            rows.append((eid, t0 + pd.Timedelta(hours=h, minutes=i), 1, et, 1.0, "{}"))
            eid += 1
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=cols), schema=J.EVENTS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)
    # sentinel far in the future (watermark passes both hours' window
    # ends) — written as a SEPARATE, LATER file: the file source orders
    # batches by modification time, and if the sentinel's file were picked
    # up before some hour-0/1 files, those events would arrive behind the
    # watermark and be dropped (observed flake with one multi-part write)
    import time as _time

    _time.sleep(1.1)
    sentinel = [(9999, t0 + pd.Timedelta(hours=12), 9, "view", 1.0, "{}")]
    spark.createDataFrame(
        pd.DataFrame(sentinel, columns=cols), schema=J.EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(d)

    q = J.trending_stream(spark, d, out, ckpt, window="1 hour",
                          watermark="2 hours", k=2)
    q.awaitTermination()
    got = {
        (str(r.window_start), r.event_type, r.n, r.rank)
        for r in J.read_run_output(spark, out).drop("epoch").collect()
    }

    batch = (
        spark.read.parquet(d)
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        # only windows the final watermark (12:00 - 2h = 10:00) finalized
        .where(F.col("window_start") < F.lit("2024-01-01 09:00:00").cast("timestamp"))
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
    want = {
        (str(r.window_start), r.event_type, r.n, r.rank)
        for r in batch.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2).collect()
    }
    assert got == want
    assert ("2024-01-01 00:00:00", "click", 5, 1) in got
    assert ("2024-01-01 01:00:00", "error", 4, 1) in got


def test_enrich_stream_matches_batch_join(spark, events_dir):
    """Stream-static broadcast enrichment == the batch join over the same
    input; dimension misses keep the event (left join) with NULL attrs."""
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("error", -1.0)],
        "event_type string, weight double",
    )
    got = J.run_available_now(
        J.enrich_stream(J.read_event_stream(spark, events_dir), dim, on="event_type"),
        "enriched",
    )
    batch = spark.read.parquet(f"{SF}/events.parquet").join(
        dim, "event_type", "left"
    )
    g = {(r.event_id, r.weight) for r in got.collect()}
    b = {(r.event_id, r.weight) for r in batch.collect()}
    assert g == b and len(g) > 0
    assert any(w is None for _, w in g)  # view/signup events miss the dim


def test_transfer_edges_stream_matches_batch_rule(spark, tmp_path):
    """Push-path TRANSFERRED maintenance: streamed per-epoch deltas folded
    by read_transfer_edges must equal operators.edge_rules.transfer_edges'
    TRANSFERRED weights over the union of all streamed files — including
    webhook redeliveries (exact duplicate rows) within and across
    micro-batches, which the watermark-bounded dedup must absorb."""
    import datetime as dt
    import time as _time

    from web3_knowledge_graph_spark.operators import edge_rules as ER

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for r in range(60):
        rows.append(
            (
                base + dt.timedelta(minutes=r),
                f"0xfrom{r % 5}",
                f"0xto{(r + 1) % 4}",
                f"0xh{r - (r % 2)}",  # consecutive rows share a tx hash
                "0xtok",
                float(r),
            )
        )
    dup_rows = rows[10:20]  # redelivered verbatim in a later file
    schema = (
        "ts timestamp, from_address string, to_address string,"
        " tx_hash string, contract_address string, amount double"
    )
    d = tmp_path / "transfers"
    for chunk in (rows[:30], rows[30:] + dup_rows):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        _time.sleep(1.1)

    out, ckpt = str(tmp_path / "edges_out"), str(tmp_path / "ckpt")
    q = J.transfer_edges_stream(spark, str(d), out, ckpt)
    q.awaitTermination()
    got = {
        (r["from_address"], r["to_address"]): r["nb_transfer"]
        for r in J.read_transfer_edges(spark, out).collect()
    }

    batch = ER.transfer_edges(
        spark.createDataFrame(rows + dup_rows, schema)
    ).where(F.col("pred") == "TRANSFERRED")
    want = {
        (r["subj_key"], r["obj_key"]): r["weight"] for r in batch.collect()
    }
    assert got == want
    # redeliveries really were absorbed, not recounted: the 60 original
    # rows are 60 distinct (from, to, hash) triples (hash-sharing pairs
    # differ in endpoints), and the 10 redelivered rows add nothing
    assert sum(got.values()) == 60


def test_transfer_edges_fresh_checkpoint_new_run_namespace(spark, tmp_path):
    """Restarting the transfer-edge maintenance with a FRESH checkpoint
    over an EXISTING out_dir must not fold a mix of runs: the new run
    reprocesses everything into its own run=<id> namespace and
    read_transfer_edges folds only the latest run (round-3 advice on the
    flat epoch=<id> layout). A restart WITH the old checkpoint keeps its
    namespace (epoch replay stays idempotent)."""
    import datetime as dt
    import time as _time

    from web3_knowledge_graph_spark.operators import edge_rules as ER

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (
            base + dt.timedelta(minutes=r),
            f"0xfrom{r % 3}",
            f"0xto{(r + 1) % 3}",
            f"0xh{r}",
            "0xtok",
            float(r),
        )
        for r in range(20)
    ]
    schema = (
        "ts timestamp, from_address string, to_address string,"
        " tx_hash string, contract_address string, amount double"
    )
    d = tmp_path / "transfers"
    # two files → two epochs in the first run (maxFilesPerTrigger=1)
    for chunk in (rows[:10], rows[10:]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
        _time.sleep(1.1)

    out = str(tmp_path / "edges_out")
    q = J.transfer_edges_stream(spark, str(d), out, str(tmp_path / "ckpt1"))
    q.awaitTermination()

    want = {
        (r["subj_key"], r["obj_key"]): r["weight"]
        for r in ER.transfer_edges(spark.createDataFrame(rows, schema))
        .where(F.col("pred") == "TRANSFERRED")
        .collect()
    }

    def _fold():
        return {
            (r["from_address"], r["to_address"]): r["nb_transfer"]
            for r in J.read_transfer_edges(spark, out).collect()
        }

    assert _fold() == want

    # fresh checkpoint, same out_dir: full reprocess into run=000001;
    # the fold must still equal the batch rule exactly once
    q2 = J.transfer_edges_stream(spark, str(d), out, str(tmp_path / "ckpt2"))
    q2.awaitTermination()
    assert _fold() == want
    import glob
    assert sorted(
        p.rsplit("=", 1)[1] for p in glob.glob(f"{out}/run=*")
    ) == ["000000", "000001"]

    # restart WITH an existing checkpoint: namespace is pinned, nothing
    # new to process, fold unchanged
    q3 = J.transfer_edges_stream(spark, str(d), out, str(tmp_path / "ckpt2"))
    q3.awaitTermination()
    assert _fold() == want
    assert len(glob.glob(f"{out}/run=*")) == 2
