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


# survivors cache per sf_dir (the replay is deterministic and the store
# dirs are temp — rerunning within a session would re-append)
_NEARDUP_RESULTS: dict = {}


def replay_stream_neardup_ingest(spark, sf_dir: str):
    """Near-dup-on-ingest as a REAL structured-streaming query — the
    dedup ladder running continuously: a minhash signature store is
    seeded from the base corpus slice (doc_id % 3 == 0); the remaining
    documents arrive as a file-source stream in two deterministic
    micro-batches (split at doc_id 250, file mtimes force the order);
    each batch drops docs that near-dup the STORE or a LOWER-id doc in
    the same batch, appends the survivors' signatures (the minor flush),
    and emits the survivors. The end state must equal the sequential
    greedy replay the SQL oracle computes — a wrong batch order, a
    skipped append, or recall loss all hash-mismatch.

    Drop rule is deliberately non-transitive ("near-dups the store or
    ANY lower-id batch doc", surviving or not): it needs no within-batch
    iteration, and the oracle states it verbatim."""
    import os
    import shutil
    import tempfile

    from accumulo_wikisearch_spark.operators import dedup as D
    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    cached = _NEARDUP_RESULTS.get(sf_dir)
    if cached is not None:
        return spark.read.parquet(cached).select("doc_id")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store = tempfile.mkdtemp(prefix="stream-mstore-")
    D.write_minhash_store(docs.where(F.col("doc_id") % 3 == 0), store)
    stage = tempfile.mkdtemp(prefix="doc-stream-stage-")
    conds = [
        (F.col("doc_id") % 3 != 0) & (F.col("doc_id") < 250),
        (F.col("doc_id") % 3 != 0) & (F.col("doc_id") >= 250),
    ]
    for i, cond in enumerate(conds):
        tmp = tempfile.mkdtemp(prefix=f"neardup-batch{i}-")
        docs.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{stage}/batch_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        t = 1_000_000_000 + i * 1000
        os.utime(dst, (t, t))  # file-source batch order = mtime order
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    out_dir = tempfile.mkdtemp(prefix="stream-neardup-out-")

    def process_batch(bdf, _bid):
        # lineage barrier: the batch feeds three plans (self-pairs, store
        # check, anti-join) — see operators/pipeline.py's barrier note
        bdf = bdf.localCheckpoint()
        drop_self = D.minhash_lsh_pairs(bdf).select(
            F.col("b_id").alias("doc_id")
        )
        dup_store = D.near_dups_vs_store(spark, bdf, store).select(
            F.col("new_id").alias("doc_id")
        )
        survivors = bdf.join(
            drop_self.unionByName(dup_store).distinct(), "doc_id", "left_anti"
        ).localCheckpoint()
        D.append_minhash_store(survivors, store)
        survivors.select("doc_id").write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="neardup-ckpt-"))
        .start()
    )
    q.awaitTermination()
    _NEARDUP_RESULTS[sf_dir] = out_dir
    return spark.read.parquet(out_dir).select("doc_id")


# final-store cache per (sketch, sf_dir) — the streaming replays build
# their at-rest store once per session (same rationale as _NEARDUP_RESULTS)
_SKETCH_STORE_RESULTS: dict = {}


def _replay_stream_sketch(spark, sf_dir: str, prefix: str, build, merge):
    """Shared harness for the sketch-maintenance stream replays: stage the
    events table as two deterministic micro-batch files (mtime-ordered),
    then foreachBatch-``merge`` each batch's ``build`` output into an
    at-rest store with the tmp-then-swap pattern, localCheckpoint-ing the
    merge BEFORE the swap deletes the files under its plan. One
    implementation so a harness fix can never silently miss a sketch
    (this file previously carried three near-verbatim copies)."""
    import os
    import shutil
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    cached = _SKETCH_STORE_RESULTS.get((prefix, sf_dir))
    if cached is not None:
        return spark.read.parquet(cached)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    stage = tempfile.mkdtemp(prefix=f"{prefix}-stream-stage-")
    for i, cond in enumerate(
        [F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1]
    ):
        tmp = tempfile.mkdtemp(prefix=f"{prefix}-batch{i}-")
        events.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{stage}/batch_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        t = 1_000_000_000 + i * 1000
        os.utime(dst, (t, t))  # deterministic micro-batch order
    store = tempfile.mkdtemp(prefix=f"{prefix}-store-")

    def process_batch(bdf, _bid):
        fresh = build(bdf)
        if os.listdir(store):
            old = spark.read.parquet(store)
            # materialize BEFORE the swap deletes the files under the plan
            merged = merge(old, fresh).localCheckpoint()
        else:
            merged = fresh
        tmp_out = store + ".tmp"
        merged.write.mode("overwrite").parquet(tmp_out)
        shutil.rmtree(store, ignore_errors=True)
        os.rename(tmp_out, store)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"{prefix}-ckpt-"))
        .start()
    )
    q.awaitTermination()
    _SKETCH_STORE_RESULTS[(prefix, sf_dir)] = store
    return spark.read.parquet(store)


def replay_stream_hll(spark, sf_dir: str):
    """HLL cardinality registers maintained CONTINUOUSLY over an event
    stream: each micro-batch's registers MAX-merge into an at-rest store
    (tmp-then-swap, the compaction pattern). Because the merge is
    associative, commutative and idempotent, the store after ANY batching
    of the stream equals the one-shot batch sketch — so the oracle simply
    computes the batch registers over the whole table, and a lost batch,
    double-merge bug, or non-commutative register update hash-mismatches.

    The 100 TB shape: distinct-users-per-type tracked forever at
    O(groups x m) state, no raw-event retention, no state-store growth —
    the streaming twin of ``sketch_hll_registers``."""
    from accumulo_wikisearch_spark.operators.sketches import (
        hll_registers,
        merge_registers,
    )

    return _replay_stream_sketch(
        spark,
        sf_dir,
        "hll",
        lambda bdf: hll_registers(bdf, "event_type", "user_id"),
        merge_registers,
    )


def replay_stream_cms(spark, sf_dir: str):
    """CMS frequency counters maintained CONTINUOUSLY over an event
    stream: each micro-batch's (row, col, cnt) cells SUM-merge into an
    at-rest store (tmp-then-swap) — the additive twin of
    :func:`replay_stream_hll`. Because the merge is associative and
    commutative over DISJOINT batches, the store after any batching of
    the stream equals the one-shot batch sketch, so the oracle computes
    the batch counter table over the whole table. Unlike the idempotent
    HLL MAX-merge, a replayed/double-merged batch shifts counts — the
    hash check catches exactly-once violations, not just losses.

    The 100 TB shape: per-key frequency tracked forever at
    O(width × depth) state, no raw-event retention — heavy-hitter and
    rate-limit queries probe the store without touching the stream."""
    from accumulo_wikisearch_spark.operators.sketches import cms_build, cms_merge

    return _replay_stream_sketch(
        spark, sf_dir, "cms", lambda bdf: cms_build(bdf, "user_id"), cms_merge
    )


def replay_stream_bloom(spark, sf_dir: str):
    """Bloom membership bitset maintained CONTINUOUSLY over an event
    stream: each micro-batch's (word, bits) rows ``bit_or``-merge into an
    at-rest store (tmp-then-swap) — completing the sketch × streaming
    matrix (HLL max-merge, CMS sum-merge, Bloom or-merge). Bloom is the
    only IDEMPOTENT one of the three: or-ing a batch in twice is a
    no-op, so this store is provably safe under AT-LEAST-ONCE delivery
    (a redelivered batch cannot corrupt it), where the CMS store needs
    exactly-once (its hash check is what catches violations). The
    idempotence contrast is pinned by a double-feed pytest
    (tests/test_streaming_sketches.py).

    The 100 TB shape: a "seen before" membership set over an unbounded
    stream at O(n_words) state — decontamination and first-seen checks
    probe the store without touching the stream."""
    from accumulo_wikisearch_spark.operators.sketches import bloom_build, bloom_merge

    return _replay_stream_sketch(
        spark, sf_dir, "bloom", lambda bdf: bloom_build(bdf, "user_id"), bloom_merge
    )


def replay_stream_hist(spark, sf_dir: str):
    """Equi-width histogram maintained CONTINUOUSLY over an event stream:
    per-bucket SUM-merge into the at-rest table (the CMS algebra —
    additive over disjoint batches, NOT idempotent, so the hash check is
    a delivery-semantics gate here too). Rounds out the sketch ×
    streaming matrix: HLL max, CMS sum, Bloom or, histogram sum — all
    four are 3-line wrappers over the shared replay harness. A fixed
    [lo, hi] domain is REQUIRED in the streaming setting (the mergeable
    algebra needs one shared domain; a per-batch auto-domain would bucket
    incompatibly), which is exactly why hist_build keeps the pinned-
    domain form alongside hist_build_auto.

    The 100 TB shape: a per-group value distribution tracked forever at
    O(groups × n_buckets) state, no raw-event retention — quantile and
    drift queries read the store, never the stream."""
    from accumulo_wikisearch_spark.operators.sketches import hist_build, hist_merge

    return _replay_stream_sketch(
        spark,
        sf_dir,
        "hist",
        lambda bdf: hist_build(bdf, "event_type", "value"),
        hist_merge,
    )


def _neardup_ingest_sql(k: int = 3, num: int = 4, den: int = 5) -> str:
    """Sequential greedy replay of the two-batch near-dup ingest: the
    symmetric exact-Jaccard pair set once, then batch-0 survivors vs the
    base store, store' = base ∪ survivors(0), then batch-1 survivors vs
    store'."""
    gram = "||' '||".join(f"wl[i+{j}]" for j in range(k))
    return f"""
WITH w AS (SELECT doc_id, string_split(text,' ') AS wl FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct([{gram} for i in range(1, len(wl) - {k - 2})])) AS shingle
  FROM w WHERE len(wl) >= {k}
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
allp AS (
  SELECT a_id, b_id FROM (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
  ) j
  JOIN cnt ca ON ca.doc_id = a_id
  JOIN cnt cb ON cb.doc_id = b_id
  WHERE {den} * common >= {num} * (ca.n + cb.n - common)
),
base AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
b0 AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0 AND doc_id < 250),
b1 AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0 AND doc_id >= 250),
s0 AS (
  SELECT doc_id FROM b0
  WHERE NOT EXISTS (
      SELECT 1 FROM allp p JOIN base ON p.a_id = base.doc_id
      WHERE p.b_id = b0.doc_id)
    AND NOT EXISTS (
      SELECT 1 FROM allp p JOIN b0 a2 ON p.a_id = a2.doc_id
      WHERE p.b_id = b0.doc_id AND a2.doc_id < b0.doc_id)
),
st1 AS (SELECT doc_id FROM base UNION SELECT doc_id FROM s0),
s1 AS (
  SELECT doc_id FROM b1
  WHERE NOT EXISTS (
      SELECT 1 FROM allp p JOIN st1 ON p.a_id = st1.doc_id
      WHERE p.b_id = b1.doc_id)
    AND NOT EXISTS (
      SELECT 1 FROM allp p JOIN b1 a2 ON p.a_id = a2.doc_id
      WHERE p.b_id = b1.doc_id AND a2.doc_id < b1.doc_id)
)
SELECT doc_id FROM s0 UNION ALL SELECT doc_id FROM s1
"""


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
        "doc_stream_neardup_ingest": replay_stream_neardup_ingest,
        "sketch_hll_stream_replay": replay_stream_hll,
        "sketch_cms_stream_replay": replay_stream_cms,
        "sketch_bloom_stream_replay": replay_stream_bloom,
        "sketch_hist_stream_replay": replay_stream_hist,
    }


def _hll_stream_sql() -> str:
    # the at-rest store after max-merging every micro-batch == the batch
    # sketch over the whole table (merge is order/batching-insensitive)
    from accumulo_wikisearch_spark.operators.sketches import _reg_sql

    return _reg_sql("events", "event_type", "user_id")


def _cms_stream_sql() -> str:
    # the at-rest store after sum-merging every DISJOINT micro-batch ==
    # the one-shot batch counter table over the whole stream
    from accumulo_wikisearch_spark.operators.sketches import _cms_table_sql

    return _cms_table_sql("events", "user_id")


def _hist_stream_sql() -> str:
    from accumulo_wikisearch_spark.operators import sketches

    return sketches.oracle_sql()["sketch_hist_merge"]


def _bloom_stream_sql() -> str:
    # the at-rest store after or-merging every micro-batch == the batch
    # bitset over the whole stream (idempotent merge — ANY batching, even
    # overlapping redelivery, lands on the same fixpoint)
    from accumulo_wikisearch_spark.operators.sketches import _bloom_table_sql

    return _bloom_table_sql("events", "user_id")


def oracle_sql():
    return {
        "ev_stream_windowed_replay": _REPLAY_SQL,
        "ev_stream_dedup_replay": _DEDUP_REPLAY_SQL,
        "doc_stream_neardup_ingest": _neardup_ingest_sql(),
        "sketch_hll_stream_replay": _hll_stream_sql(),
        "sketch_cms_stream_replay": _cms_stream_sql(),
        "sketch_bloom_stream_replay": _bloom_stream_sql(),
        # sum-merged disjoint batches == the direct one-shot table (the
        # same SQL as sketch_hist_merge's direct-build oracle)
        "sketch_hist_stream_replay": _hist_stream_sql(),
    }
