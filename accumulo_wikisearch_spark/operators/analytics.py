"""Time-window analytics over the events stream table.

The batch twin of the Structured Streaming shape: tumbling-window
aggregation with ``F.window`` is exactly what ``readStream … groupBy(window
(ts, '1 hour'))`` executes per micro-batch, so correctness proven here
carries to the streaming deployment (same Catalyst plan, plus watermarking).

Outputs are integer-only (epoch seconds, counts) for oracle hash-stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.session import tune_runtime


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accumulo_wikisearch_spark.sources.events import read_events

    return read_events(spark, sf_dir).drop("ts_us")


def windowed_event_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + distinct users per (window, event_type)."""
    w = F.window(F.col("ts"), width)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session assignment per user: a new session starts after a gap ≥
    ``gap_minutes``. Classic gaps-and-islands via lag + running sum — one
    shuffle on user_id; at scale this is the standard sessionization plan
    (or ``applyInPandasWithState`` in streaming)."""
    from pyspark.sql import Window

    uw = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(uw)
    new_sess = (gap.isNull() | (gap >= gap_minutes * 60)).cast("int")
    return (
        events.withColumn("_new", new_sess)
        .withColumn("session_seq", F.sum("_new").over(uw))
        .drop("_new")
    )


def session_stats_native(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-session stats via Spark's native ``F.session_window`` (merging
    windows; the same operator the streaming engine uses for session
    aggregation with watermark-evicted state). Semantics match
    :func:`sessionize`: a new session starts when the gap to the previous
    event is ≥ the gap duration (session windows are half-open
    ``[start, last+gap)``). Outputs integers (epoch micros) for oracle
    hash-stability."""
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy("user_id", w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
        )
        .select("user_id", "session_start_us", "n_events", "span_us")
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session stats: events per session, span seconds (integers)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (
            F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))
        ).alias("span_seconds"),
    )


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def props_extract(events: DataFrame) -> DataFrame:
    """Schema-on-read over the semi-structured ``props`` JSON column:
    parse with an explicit schema (``from_json`` — JVM-side, codegen), no
    UDF. (event_id, k) with unparsable/missing keys as NULL→-1 (driver
    hash-compare may not tolerate NULLs)."""
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return events.select(
        "event_id", F.coalesce(parsed["k"], F.lit(-1)).cast("long").alias("k")
    )


def props_stats_by_type(events: DataFrame) -> DataFrame:
    """JSON values flowing into a relational aggregate: per event_type
    count / sum / min / max of props.k — one partial-agg exchange."""
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").cast("long").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
    )


def retention_cohorts(events: DataFrame, week_seconds: int = 604800) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week, with
    distinct-user counts at each week offset — the standard engagement
    triangle of a training-data/product pipeline.

    One user-keyed shuffle builds each user's distinct active weeks
    (array_distinct inside the aggregate — no second distinct exchange); the
    cohort week is the array min, so no window re-partition; the final
    groupBy counts rows that are distinct (user, week) pairs by
    construction. Integer week arithmetic (timestamp truncated to seconds)
    keeps results engine-exact."""
    wk = F.expr(f"CAST(ts AS LONG) div {week_seconds}")
    per_user = (
        events.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.array_distinct(F.collect_list("wk")).alias("wks"))
    )
    exploded = per_user.select(
        F.array_min("wks").alias("cohort_week"), F.explode("wks").alias("wk")
    )
    return exploded.groupBy(
        "cohort_week", (F.col("wk") - F.col("cohort_week")).alias("week_offset")
    ).agg(F.count("*").cast("long").alias("n_users"))


def queries():
    def _windowed(spark, sf_dir):
        tune_runtime(spark)
        return windowed_event_counts(load_events(spark, sf_dir))

    def _sessions(spark, sf_dir):
        tune_runtime(spark)
        return session_stats(load_events(spark, sf_dir))

    def _sessions_native(spark, sf_dir):
        tune_runtime(spark)
        return session_stats_native(load_events(spark, sf_dir))

    def _props(spark, sf_dir):
        tune_runtime(spark)
        return props_extract(load_events(spark, sf_dir))

    def _props_stats(spark, sf_dir):
        tune_runtime(spark)
        return props_stats_by_type(load_events(spark, sf_dir))

    def _retention(spark, sf_dir):
        tune_runtime(spark)
        return retention_cohorts(load_events(spark, sf_dir))

    return {
        "ev_windowed_counts": _windowed,
        "ev_session_stats": _sessions,
        "ev_session_native": _sessions_native,
        "ev_props_extract": _props,
        "ev_props_stats": _props_stats,
        "ev_retention_cohorts": _retention,
    }


_WINDOWED_SQL = """
SELECT
  epoch(date_trunc('hour', ts))::BIGINT AS window_start,
  event_type,
  count(*)::BIGINT AS n_events,
  count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
"""

_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         floor(epoch(ts))::BIGINT AS t,
         lag(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id ORDER BY ts) AS pt
  FROM events
),
m AS (
  SELECT user_id, t,
         CASE WHEN pt IS NULL OR t - pt >= 1800 THEN 1 ELSE 0 END AS nw
  FROM o
),
s AS (
  SELECT user_id, t,
         SUM(nw) OVER (PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
  FROM m
)
SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
       (max(t) - min(t))::BIGINT AS span_seconds
FROM s GROUP BY user_id, session_seq
"""


# micros-precision islands (session_window compares full-precision
# timestamps, so the oracle must too — a floored-seconds gap would split
# differently near the boundary)
_SESSION_NATIVE_SQL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pt
  FROM events
),
m AS (
  SELECT user_id, t,
         CASE WHEN pt IS NULL OR t - pt >= 1800000000 THEN 1 ELSE 0 END AS nw
  FROM o
),
s AS (
  SELECT user_id, t,
         SUM(nw) OVER (PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM m
)
SELECT user_id, min(t)::BIGINT AS session_start_us,
       count(*)::BIGINT AS n_events,
       (max(t) - min(t))::BIGINT AS span_us
FROM s GROUP BY user_id, session_seq
"""


_PROPS_SQL = """
SELECT event_id,
  coalesce(json_extract(props, '$.k')::BIGINT, -1) AS k
FROM events
"""

_PROPS_STATS_SQL = """
WITH p AS (
  SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events
)
SELECT event_type, count(k)::BIGINT AS n, sum(k)::BIGINT AS sum_k,
       min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k
FROM p GROUP BY event_type
"""


_RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, floor(epoch(ts))::BIGINT // 604800 AS wk FROM events
),
c AS (
  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM uw
)
SELECT cohort_week, (wk - cohort_week) AS week_offset, count(*)::BIGINT AS n_users
FROM c GROUP BY 1, 2
"""


def oracle_sql():
    return {
        "ev_windowed_counts": _WINDOWED_SQL,
        "ev_session_stats": _SESSION_SQL,
        "ev_session_native": _SESSION_NATIVE_SQL,
        "ev_props_extract": _PROPS_SQL,
        "ev_props_stats": _PROPS_STATS_SQL,
        "ev_retention_cohorts": _RETENTION_SQL,
    }
