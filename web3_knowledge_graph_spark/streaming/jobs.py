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
    when a later event exceeds the gap, OR when the event-time watermark
    passes session_end + gap (GroupStateTimeout.EventTimeTimeout) — so a
    churned user's trailing session is flushed and their state removed even
    though they never send another event. Without the timeout, per-user
    state would grow monotonically with the distinct-user count and idle
    sessions would never be emitted.

  * extract_mentions_stream — the FLAGSHIP extract stage as a streaming
    job: pages landing as files → foreachBatch(extract_stage) →
    idempotent per-epoch mentions sink. Per-page stateless, so
    stream ≡ batch exactly.
  * dedup_stream — streaming exact dedup: each content fingerprint emits
    once via dropDuplicatesWithinWatermark; state expires at the
    watermark horizon.
  * trending_stream — per finalized window, top-k event types: append
    mode emits a window exactly once (when the watermark passes its
    end), which is what makes the per-epoch rank globally correct.
  * transfer_edges_stream — the widened edge vocabulary's push path:
    streaming TRANSFERRED maintenance (cross-batch (from,to,hash) dedup
    within the watermark, crash-safe per-epoch weight deltas).

Batch equivalents (driver_queries.q_events_hourly / q_sessionization) carry
the DuckDB oracle checks; tests drive these streaming versions with the
availableNow trigger against the same parquet input and compare.

Scale notes: state is partitioned by user_id (the groupBy key); watermarks
bound state size for BOTH operators — the windowed agg drops finalized
windows, and the session operator removes a user's state when their open
session times out. Cross-batch late events older than the state's last seen
timestamp are dropped (they cannot legally extend a session backward).
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


def _session_row(user_id: int, start_us: int, last_us: int, n: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us * 1000),
        "session_end": pd.Timestamp(last_us * 1000),
        "n_events": n,
    }


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user stateful session assembly. Events inside a trigger arrive
    unordered → sort; gap > SESSION_GAP_S closes the running session.

    Timeout path: when the event-time watermark passes last_us + gap the
    open session is flushed and the user's state removed (bounded state).
    Late path: a cross-batch event older than the state's last_us is
    dropped — it already falls inside the running session's span, and
    letting it through would move last_us backward and corrupt the gap
    computation for subsequent events.
    """
    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events"]
    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame([_session_row(user_id, start_us, last_us, n)], columns=cols)
        return
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = -1
        n = 0
    out: list[dict[str, Any]] = []
    # ONE sort across the whole group: a user with more rows than the Arrow
    # batch size (spark.sql.execution.arrow.maxRecordsPerBatch) arrives as
    # MULTIPLE pdfs with no cross-chunk ordering guarantee — sorting each
    # chunk separately would misread earlier events in a later chunk as
    # late-and-droppable and undercount sessions
    all_ts: list = []
    for pdf in pdfs:
        all_ts.extend(pdf["ts"])
    for ts in sorted(all_ts):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if last_us < 0:
            start_us, last_us, n = ts_us, ts_us, 1
        elif ts_us < last_us:
            continue  # late cross-batch event: already inside the session span
        elif ts_us - last_us > SESSION_GAP_S * 1_000_000:
            out.append(_session_row(user_id, start_us, last_us, n))
            start_us, last_us, n = ts_us, ts_us, 1
        else:
            last_us = ts_us
            n += 1
    timeout_ms = last_us // 1000 + SESSION_GAP_S * 1000
    if timeout_ms <= state.getCurrentWatermarkMs():
        # the watermark already passed session_end + gap: no in-watermark
        # event can ever extend this session — flush now, keep no state
        out.append(_session_row(user_id, start_us, last_us, n))
        if state.exists:
            state.remove()
    else:
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(timeout_ms)
    yield pd.DataFrame(out, columns=cols)


def sessionize_stream(events: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: session windows with a 30-min gap via
    applyInPandasWithState. A session is emitted when a subsequent event
    closes it or when the event-time watermark passes its end + gap
    (EventTimeTimeout flush); state for flushed users is removed."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def extract_mentions_stream(
    spark: SparkSession,
    pages_dir: str,
    alias_dict: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming upgrade of the FLAGSHIP extract stage: pages arriving as
    files (the webhook/push landing zone, helpers/Alchemy.py:354-460 in the
    reference) → plans.pipeline.extract_stage → append-only mentions sink.

    Mention extraction is per-page stateless (no cross-page aggregation
    crosses a micro-batch boundary: extract_stage's groupBy keys on url,
    and a page arrives whole in one file), so foreachBatch replaying the
    exact batch operator per micro-batch IS the streaming semantics —
    stream output ≡ batch extract_stage over the union of all inputs.
    Exactly-once: each epoch OVERWRITES its own ``run=<id>/epoch=<id>``
    subdirectory — a crash-replayed epoch rewrites the same directory with
    the same rows instead of appending a duplicate copy (a blind append
    sink would double every row of an epoch whose write succeeded but
    whose checkpoint commit did not), and the run namespace keeps a
    fresh-checkpoint restart's epochs apart from a superseded run's.
    Readers use ``read_run_output`` (latest run; ``epoch`` arrives as a
    discovered partition column).

    The (driver-sized) dictionary is collected ONCE here and closed over —
    not re-collected per micro-batch (a backlog drain runs hundreds of
    batches; per-batch collect jobs would add dictionary-sized latency to
    every one for zero new information).

    Returns the StreamingQuery; trigger(availableNow) drains the backlog
    and stops — the catch-up mode the reference's incremental batch loop
    approximates with cursor metadata.
    """
    from ..plans.pipeline import extract_stage
    from ..schemas import PAGES

    stream = (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    alias_rows = alias_dict.select(
        F.explode("aliases").alias("a"), "entity_id", "kind"
    ).collect()

    # run-namespaced like transfer_edges_stream: a restart with a FRESH
    # checkpoint is a full reprocess whose epoch numbering restarts at 0 —
    # without the namespace, stale epochs of the superseded run that the
    # new run never reaches would survive mixed into the output.
    rid = _pin_run_id(checkpoint_dir, out_dir)

    def _batch(df: DataFrame, epoch_id: int) -> None:
        extract_stage(df, alias_dict, alias_rows=alias_rows).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/run={rid}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream(
    spark: SparkSession, pages_dir: str, watermark_delay: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: the streaming member of the dedup ladder
    (datasets/dedup.exact_dedup is the batch form). Pages land as files;
    each content fingerprint (md5 of lowercased text) is emitted ONCE —
    the first arrival wins — via dropDuplicatesWithinWatermark keyed on
    the fingerprint.

    State contract: a fingerprint's state row expires once the event-time
    watermark passes its warc_ts + delay, so state size is bounded by the
    watermark window's distinct-fingerprint count, not the stream's
    lifetime — the standard streaming-dedup tradeoff (a duplicate arriving
    later than the watermark horizon re-emits; exact global dedup over
    unbounded history is the batch operator's job, this bounds the
    near-real-time window).
    """
    from ..schemas import PAGES

    stream = spark.readStream.schema(PAGES).parquet(pages_dir)
    fp = stream.select(
        "url",
        "warc_ts",
        F.md5(F.lower(F.col("text"))).alias("fingerprint"),
    )
    return fp.withWatermark("warc_ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: each streaming event joined
    against a (batch) dimension table — the push-path form of the
    reference's lookup joins (spam labels, account classes, alias
    dictionaries; e.g. postProcessing/spam/cyphers.py:11-18 applied at
    ingest time instead of post-hoc).

    The static side is explicitly broadcast: a stream-static join must
    never shuffle the unbounded stream side, and the dimension re-reads
    per micro-batch (so dimension updates between triggers are picked up
    — the Spark contract for stream-static joins). Stateless, so
    stream ≡ batch join exactly.
    """
    return events.join(F.broadcast(dim), on, how)


def trending_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 3,
):
    """Streaming trending top-k: per finalized tumbling window, the k
    event types with the most events (ties broken by name — deterministic).

    Composition, not a new stateful operator: windowed_event_counts in
    APPEND mode emits a window's rows exactly once — when the event-time
    watermark passes its end — so every row of a finalized window arrives
    in ONE foreachBatch epoch, and a plain batch rank inside the epoch is
    globally correct. (A streaming rank-over-agg is unsupported for
    exactly this reason; the append-mode watermark contract is what makes
    the per-epoch rank sound.) Epochs overwrite their own
    run=<id>/epoch=<id> directory — the idempotent, run-namespaced replay
    sink proven by extract_mentions_stream.

    State stays bounded by the watermark horizon (finalized windows are
    dropped from the agg state); the rank is per-window and window
    cardinality per epoch is tiny.

    Returns the StreamingQuery (trigger availableNow — drain and stop).
    """
    from pyspark.sql import Window as W

    counts = windowed_event_counts(
        read_event_stream(spark, events_dir), window=window, watermark=watermark
    )

    # same run-namespacing as extract_mentions_stream / transfer_edges_stream
    rid = _pin_run_id(checkpoint_dir, out_dir)

    def _batch(df: DataFrame, epoch_id: int) -> None:
        w = W.partitionBy("window_start").orderBy(F.desc("n"), "event_type")
        (
            df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/run={rid}/epoch={epoch_id}")
        )

    return (
        counts.writeStream.foreachBatch(_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


TRANSFERS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),  # block time (event time)
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("tx_hash", T.StringType()),
        T.StructField("contract_address", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def transfer_edges_stream(
    spark: SparkSession,
    transfers_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
):
    """Push-path maintenance of the TRANSFERRED edge family: token
    transfers landing as files (the reference's Alchemy webhook push,
    helpers/Alchemy.py:354-460, feeding the same MERGE the batch scrape
    uses — tokenHolders/cyphers.py:55-70 increments ``nb_transfer`` ON
    MATCH) → streaming dedup → per-epoch weight deltas.

    Composition:
      * dropDuplicatesWithinWatermark on (from, to, hash) replays the
        batch rule's dedup-before-count (ingest.py:31) ACROSS micro-batches
        — a webhook redelivering a tx within the watermark horizon does
        not double nb_transfer; state expires at the horizon (the standard
        streaming-dedup bound — older redeliveries are the idempotent
        batch MERGE's job).
      * accumulation is NOT idempotent, so instead of mutating a running
        total in foreachBatch (a crash-replayed epoch would double-count),
        each epoch OVERWRITES its own ``run=<rid>/epoch=<id>`` delta
        partition of per-pair counts; ``read_transfer_edges`` folds the
        deltas OF THE LATEST RUN ONLY. At scale the delta log compacts
        into the warehouse edges table with one MERGE
        (weight = weight + delta) per maintenance window.
      * run namespacing decouples the out_dir lifecycle from the
        checkpoint lifecycle: restarting with a FRESH checkpoint over an
        existing out_dir resets epoch ids to 0, which under a flat
        ``epoch=<id>`` layout would overwrite some old partitions while
        leaving later ones — folding a silent mix of runs. The run id is
        pinned in the checkpoint dir (same storage contract as the
        checkpoint itself), so a crash-restart WITH the checkpoint keeps
        its namespace (epoch replay stays idempotent) while a fresh
        checkpoint gets the next run id and the reader ignores prior runs.

    Returns the StreamingQuery (availableNow — drain and stop).
    """
    run_id = _pin_run_id(checkpoint_dir, out_dir)
    stream = (
        spark.readStream.schema(TRANSFERS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(transfers_dir)
    )
    first_seen = (
        stream.select(
            "ts",
            F.lower(F.trim("from_address")).alias("from_address"),
            F.lower(F.trim("to_address")).alias("to_address"),
            F.lower(F.trim("tx_hash")).alias("tx_hash"),
        )
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["from_address", "to_address", "tx_hash"])
    )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        (
            df.groupBy("from_address", "to_address")
            .agg(F.count(F.lit(1)).cast("long").alias("nb_delta"))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/run={run_id}/epoch={epoch_id}")
        )

    return (
        first_seen.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _pin_run_id(checkpoint_dir: str, out_dir: str) -> str:
    """Resolve (and pin) the delta-run namespace for a checkpointed sink:
    reuse the run id stored in the checkpoint dir if one exists (restart
    with checkpoint → same namespace → epoch-overwrite idempotence),
    otherwise allocate the next zero-padded id after the existing
    ``run=*`` dirs and store it. Driver-side file I/O — the same storage
    the stream's checkpoint already requires."""
    import glob as _glob
    import os

    marker = os.path.join(checkpoint_dir, "__delta_run_id__")
    if os.path.exists(marker):
        with open(marker) as fh:
            rid = fh.read().strip()
        if rid:  # an empty marker (legacy torn write) reallocates below
            return rid
    existing = _glob.glob(os.path.join(out_dir, "run=*"))
    nxt = max(
        (int(os.path.basename(p).split("=", 1)[1]) for p in existing),
        default=-1,
    ) + 1
    run_id = f"{nxt:06d}"
    os.makedirs(checkpoint_dir, exist_ok=True)
    # tmp + atomic replace, like CheckpointLog.mark and the warehouse
    # _CURRENT pointer: a crash mid-write must not leave an empty marker
    # that a checkpointed restart would trust as run_id ''
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(run_id)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, marker)
    return run_id


def _latest_run_dir(out_dir: str) -> str:
    """The LATEST ``run=*`` namespace of a run-namespaced epoch sink —
    earlier runs are superseded restarts (fresh checkpoint = full
    reprocess), so reading them would double-count. Falls back to the
    bare dir for pre-namespace layouts."""
    import glob as _glob
    import os

    runs = sorted(_glob.glob(os.path.join(out_dir, "run=*")))
    return runs[-1] if runs else out_dir


def read_run_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the latest run's epochs of a run-namespaced sink
    (extract_mentions_stream / trending_stream); ``epoch`` arrives as a
    discovered partition column."""
    return spark.read.parquet(_latest_run_dir(out_dir))


def read_transfer_edges(spark: SparkSession, out_dir: str) -> DataFrame:
    """Fold the per-epoch deltas of the LATEST run into the current
    TRANSFERRED weights — equivalent to
    operators.edge_rules.transfer_edges' TRANSFERRED family over the union
    of all streamed files (proven by test)."""
    return (
        spark.read.parquet(_latest_run_dir(out_dir))
        .groupBy("from_address", "to_address")
        .agg(F.sum("nb_delta").cast("double").alias("nb_transfer"))
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
