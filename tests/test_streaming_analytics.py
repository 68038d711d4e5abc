"""Streaming analytics tests: watermarked windowed aggregation and the
applyInPandasWithState sessionizer, run as live micro-batch streams over a
file source (maxFilesPerTrigger=1 forces multiple batches so cross-batch
state carry-over is actually exercised)."""

import tempfile
import time

import pytest

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.streaming.analytics import (
    sessionize_stream,
    windowed_counts_stream,
)

EVENT_SCHEMA = "user_id long, ts long, event_type string"


def _run_stream(
    df, name, output_mode="update", timeout_s=300, drain_only=False,
    expected_rows=None,
):
    """Run an availableNow stream to completion, loudly (the r8
    silent-timeout lesson: ignoring awaitTermination's False reads a
    half-filled sink and fails on DATA).

    ``drain_only`` is for streams holding a pending PROCESSING-TIME
    timer (sessionize's gap timeout): those never self-terminate — the
    availableNow query spins empty "cleaning up state" batches until
    the timer fires, 30 MINUTES for the default gap — so completion is
    the first committed EMPTY batch AFTER all ``expected_rows`` input
    rows were consumed, after which the idle query is stopped. The
    row-count requirement matters with maxFilesPerTrigger=1: a
    state-cleanup/timer batch can interleave BEFORE the remaining
    queued files, and treating that first zero-input progress as
    completion would read a half-filled sink (r9 ADVICE). Watermark-
    flushing streams (dropDuplicatesWithinWatermark, append-mode aggs)
    must NOT use drain_only: their held rows are only emitted by later
    batches, and availableNow runs those and terminates."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not drain_only:
        assert q.awaitTermination(timeout_s), (
            f"stream {name} did not finish in {timeout_s}s"
        )
        return q
    assert expected_rows is not None, "drain_only needs expected_rows"
    deadline = time.time() + timeout_s
    # accumulated ACROSS polls: recentProgress retains only the last
    # ~100 batches, so a long run of empty timer batches could evict the
    # data batches' entries — a per-poll sum would then undercount
    # forever and time out spuriously
    seen: dict[int, int] = {}
    while q.isActive:
        for p in q.recentProgress:
            seen[p["batchId"]] = p["numInputRows"]
        total_in = sum(seen.values())
        lp = q.lastProgress
        if (
            total_in >= expected_rows
            and lp is not None
            and lp["numInputRows"] == 0
        ):
            break
        if time.time() > deadline:
            q.stop()
            raise AssertionError(
                f"stream {name} drained {total_in}/{expected_rows} rows"
                f" in {timeout_s}s"
            )
        time.sleep(0.3)
    if q.exception() is not None:
        raise q.exception()
    q.stop()
    assert q.awaitTermination(timeout_s), f"stream {name} did not stop"
    return q


def test_windowed_counts_stream(spark):
    with tempfile.TemporaryDirectory() as tmp:
        rows = [
            (1, 100, "click"),
            (2, 200, "click"),
            (1, 3700, "view"),  # next hour window
        ]
        spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(f"{tmp}/in/b0")
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .parquet(f"{tmp}/in/*")
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        _run_stream(windowed_counts_stream(stream), "win_counts")
        got = {
            (r["window_start"].timestamp(), r["event_type"]): (
                r["n_events"],
                r["n_users_approx"],
            )
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got[(0.0, "click")] == (2, 2)
        assert got[(3600.0, "view")] == (1, 1)


def test_sessionize_stream_across_batches(spark):
    with tempfile.TemporaryDirectory() as tmp:
        # batch 0: two events 100s apart; batch 1: one more in-session event
        # and one far-future event that closes the session (gap >= 1800)
        # coalesce(1): one file per batch, so maxFilesPerTrigger=1 yields
        # exactly two ordered micro-batches
        spark.createDataFrame(
            [(1, 0, "x"), (1, 100, "x")], EVENT_SCHEMA
        ).coalesce(1).write.parquet(f"{tmp}/in/b0")
        b0_done = time.time()
        spark.createDataFrame(
            [(1, 200, "x"), (1, 5000, "x")], EVENT_SCHEMA
        ).coalesce(1).write.parquet(f"{tmp}/in/b1")

        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        _run_stream(
            sessionize_stream(stream), "sessions", drain_only=True,
            expected_rows=4,
        )
        rows = spark.sql("SELECT * FROM sessions ORDER BY session_start").collect()
        assert b0_done  # silence lint; ordering of file pickup is by path

        closed = [r for r in rows if r["closed"]]
        assert len(closed) == 1
        c = closed[0]
        # events 0,100,200 form one session (closed by the 5000 event);
        # cross-batch continuity means n_events counts all three
        assert (c["session_start"], c["session_end"], c["n_events"]) == (0, 200, 3)
        open_rows = [r for r in rows if not r["closed"]]
        assert any(
            (r["session_start"], r["n_events"]) == (5000, 1) for r in open_rows
        )


@pytest.mark.parametrize("gap", [1800])
def test_sessionize_single_batch_splits(spark, gap):
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(7, 0, "x"), (7, 10, "x"), (7, 10_000, "x")], EVENT_SCHEMA
        ).write.parquet(f"{tmp}/in/b0")
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(f"{tmp}/in/*")
        _run_stream(
            sessionize_stream(stream, gap_seconds=gap),
            "sessions_one",
            drain_only=True,
            expected_rows=3,
        )
        rows = spark.sql("SELECT * FROM sessions_one").collect()
        closed = [r for r in rows if r["closed"]]
        assert [(r["session_start"], r["session_end"], r["n_events"]) for r in closed] == [
            (0, 10, 2)
        ]


def test_dedup_stream_drops_rearrivals_across_batches(spark):
    from accumulo_wikisearch_spark.streaming.analytics import dedup_stream

    DOC_SCHEMA = "doc_id long, ts long, text string"
    with tempfile.TemporaryDirectory() as tmp:
        # batch 0: two distinct texts; batch 1: re-arrival of "alpha" (dup,
        # within watermark) + one new text — maxFilesPerTrigger=1 forces the
        # dedup state to carry across micro-batches
        spark.createDataFrame(
            [(1, 100, "alpha"), (2, 110, "beta")], DOC_SCHEMA
        ).write.parquet(f"{tmp}/in/b0")
        spark.createDataFrame(
            [(3, 120, "alpha"), (4, 130, "gamma")], DOC_SCHEMA
        ).write.parquet(f"{tmp}/in/b1")
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
            .withColumn("ts", F.timestamp_seconds("ts"))
        )
        _run_stream(dedup_stream(stream), "dedup_out", output_mode="append")
        rows = spark.sql("SELECT text FROM dedup_out").collect()
        texts = sorted(r["text"] for r in rows)
        assert texts == ["alpha", "beta", "gamma"]  # second 'alpha' dropped


def test_attribution_join_stream_interval_bounds(spark):
    from accumulo_wikisearch_spark.streaming.analytics import attribution_join_stream

    EV = "user_id long, ts long, event_id long, event_type string"
    with tempfile.TemporaryDirectory() as tmp:
        # user 1: clicks at 100 (within 10 min of error@500) and at 5000
        # (AFTER the error — excluded); user 2: click 40 min before the
        # error — outside the lookback
        spark.createDataFrame(
            [(1, 100, 11, "click"), (1, 5000, 12, "click"), (2, 100, 21, "click")], EV
        ).write.parquet(f"{tmp}/clicks/b0")
        spark.createDataFrame(
            [(1, 500, 91, "error"), (2, 2500, 92, "error")], EV
        ).write.parquet(f"{tmp}/errors/b0")
        mk = lambda p: (
            spark.readStream.schema(EV).parquet(p).withColumn("ts", F.timestamp_seconds("ts"))
        )
        out = attribution_join_stream(mk(f"{tmp}/clicks/*"), mk(f"{tmp}/errors/*"))
        _run_stream(out, "attrib", output_mode="append")
        rows = spark.sql("SELECT error_id, click_id FROM attrib").collect()
        assert {(r["error_id"], r["click_id"]) for r in rows} == {(91, 11)}
