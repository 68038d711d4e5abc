"""Streaming event analytics: watermarked windowed aggregation and a custom
stateful sessionization operator.

These are the streaming twins of ``operators/analytics.py`` (same logical
plans, proven correct there against the DuckDB oracle in batch mode):

- ``windowed_counts_stream``: ``withWatermark`` + tumbling ``F.window``
  groupBy — Spark maintains per-window partial state and finalizes windows
  once the watermark passes, so late events within the tolerance still land
  in their window.
- ``sessionize_stream``: gaps-and-islands sessionization as a custom
  stateful operator via ``applyInPandasWithState`` — per-user session state
  carried across micro-batches, closed sessions emitted when the gap is
  observed or the state times out.

Scale posture: both shapes shuffle once on their grouping key per
micro-batch; state is partitioned by key across executors (RocksDB/HDFS
state store on a real cluster), so state size is O(active keys), not
O(events).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming exact dedup: the first arrival of each content hash passes;
    re-arrivals within the watermark horizon are dropped, and per-key state
    is evicted once the watermark moves past it — bounded memory regardless
    of stream length (``dropDuplicatesWithinWatermark``). This is the
    streaming twin of ``operators/dedup.py:exact_duplicates`` for continuous
    corpus ingestion: duplicates arriving close together (the common crawl /
    re-scrape case) are suppressed online; a periodic batch pass catches
    far-apart re-arrivals."""
    keys = key_cols or ["content_hash"]
    keyed = docs
    if key_cols is None:
        keyed = docs.withColumn("content_hash", F.md5("text"))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def windowed_counts_stream(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data tolerance.

    Identical logical plan to the batch ``windowed_event_counts`` plus the
    watermark operator; exact ``countDistinct`` is disallowed in streaming,
    so the user count is ``approx_count_distinct`` (HLL, mergeable state).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users_approx",
        )
    )


def attribution_join_stream(
    clicks: DataFrame,
    errors: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each error joined to the same user's
    clicks in the preceding ``lookback`` — the streaming twin of the batch
    lookback join (``operators/temporal.py:clicks_before_errors``).

    Both sides carry watermarks and the join condition bounds event time in
    BOTH directions, so Spark can size the join state and evict rows once
    the watermark passes — the canonical bounded-state stream-stream join.
    At scale, state is partitioned by the equality key (user_id)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    e = errors.withWatermark("ts", watermark).select(
        "user_id", F.col("ts").alias("error_ts"), F.col("event_id").alias("error_id")
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return e.join(c, cond, "inner").select(
        "user_id", "error_id", "error_ts", "click_id", "click_ts"
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events int, closed boolean"
)
SESSION_STATE_SCHEMA = "start long, last long, n int"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Per-user sessionization across micro-batches (custom stateful op).

    ``events`` needs (user_id LONG, ts castable to LONG seconds). Emits one
    row per *closed* session (gap observed or state timeout) plus the
    currently-open session (``closed = false``) on every update, so
    downstream consumers can show live session state.

    The batch twin (``operators/analytics.sessionize``) is the lag+running-
    sum window plan; this is the same truth table evaluated incrementally.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_start", "session_end", "n_events", "closed"]
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n, True)], columns=cols)
            return
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        out = []
        parts = [pdf["t"] for pdf in pdfs]
        ts = pd.concat(parts).sort_values() if parts else pd.Series([], dtype="int64")
        for t in ts:
            t = int(t)
            if start is None:
                start = last = t
                n = 1
            elif t < last:
                # late event (cross-batch disorder): fold into the open
                # session when within gap of it, else drop — the same
                # policy a watermark enforces for windowed aggs
                if t >= start - gap_seconds:
                    start = min(start, t)
                    n += 1
            elif t - last >= gap_seconds:
                out.append((user_id, start, last, n, True))
                start = last = t
                n = 1
            else:
                last = t
                n += 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutDuration(gap_seconds * 1000)
            out.append((user_id, start, last, n, False))
        if out:
            yield pd.DataFrame(out, columns=cols)

    prepared = events.select(F.col("user_id"), F.col("ts").cast("long").alias("t"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# driver registry: batch-replay of the streaming plan
# ---------------------------------------------------------------------------


def replay_windowed_counts(spark, sf_dir: str):
    """Run ``windowed_counts_stream`` as a REAL structured-streaming query
    over the events parquet (file source, availableNow trigger, memory
    sink) and return the finalized result — end-of-stream state must equal
    the batch aggregation, which is exactly what the driver's SQL oracle
    checks. This is the streaming correctness gate the pytest suite runs
    in-process, promoted to a driver-checked entry (approx-distinct column
    dropped: HLL state is not hash-stable across partitionings)."""
    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    ev = _staged_events_stream(spark, sf_dir)
    out = windowed_counts_stream(ev).select(
        F.unix_timestamp("window_start").cast("long").alias("window_start"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
    )
    return _run_to_table(spark, out, "ev_stream_windowed_replay_sink", "complete")


def _staged_events_stream(spark, sf_dir: str, copies: int = 1):
    """events.parquet as a file-source stream; ``copies>1`` symlinks the
    file several times so every event arrives that many times — the
    deterministic duplicate generator for the streaming-dedup gate
    (read-only testdata stays untouched)."""
    import os
    import tempfile

    sch = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stage = tempfile.mkdtemp(prefix="ev-stream-stage-")
    for i in range(copies):
        os.symlink(
            os.path.abspath(f"{sf_dir}/events.parquet"),
            f"{stage}/events_{i}.parquet",
        )
    ev = spark.readStream.schema(sch).parquet(stage)
    if dict(ev.dtypes)["ts"] == "bigint":
        # nanos-since-epoch LONG (see sources/events.py)
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def _run_to_table(spark, out, name: str, output_mode: str):
    spark.catalog.dropTempView(name)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def replay_stream_dedup(spark, sf_dir: str):
    """Run ``dedup_stream`` as a real structured-streaming query over the
    events parquet staged TWICE (every event arrives twice, possibly in
    different micro-batches) and return the surviving rows — exactly one
    per event_id, which is what the batch-DISTINCT oracle checks. The
    watermark delay exceeds the corpus's whole time span, so no dedup
    state is evicted mid-replay and the result is deterministic; in
    production the delay is the dedup horizon and state stays bounded."""
    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    ev = _staged_events_stream(spark, sf_dir, copies=2)
    out = dedup_stream(
        ev, ts_col="ts", watermark="3650 days", key_cols=["event_id"]
    ).select("event_id", "event_type", "user_id")
    return _run_to_table(spark, out, "ev_stream_dedup_replay_sink", "append")


_REPLAY_SQL = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
       event_type, count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2
"""

_DEDUP_REPLAY_SQL = """
SELECT event_id, event_type, user_id FROM events
"""


def queries():
    return {
        "ev_stream_windowed_replay": replay_windowed_counts,
        "ev_stream_dedup_replay": replay_stream_dedup,
    }


def oracle_sql():
    return {
        "ev_stream_windowed_replay": _REPLAY_SQL,
        "ev_stream_dedup_replay": _DEDUP_REPLAY_SQL,
    }
