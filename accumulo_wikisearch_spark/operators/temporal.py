"""Temporal join operators: as-of join and lookback range-count.

The reference has no user-level joins (SURVEY.md §2.6); these are the
Spark-native extensions a training-data / event-analytics pipeline needs.
Both are built WITHOUT a cross or inequality join — the scale shapes:

- ``asof_join``: the classic union-tag-window plan. Tag both inputs, union,
  and take ``last(right_payload, ignorenulls=True)`` over a window
  partitioned by the join keys and ordered by (time, side, payload). One
  shuffle on the keys, linear scan within each key — wall-clock is the sort,
  not a quadratic interval match. Skewed keys salt the same way any window
  does (split a hot key into sub-ranges by time, then stitch the boundary).
- ``lookback_count``: a banded range join (``right.ts ∈ [left.ts - L,
  left.ts]``) expressed as a RANGE-frame running sum over the same tagged
  union — Spark's window RANGE frame does the interval containment in one
  pass over each key's sorted events.

Determinism: ties inside a timestamp resolve by the right payload struct's
lexicographic order (greatest wins), so results are stable and
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _payload_struct_type(df: DataFrame, cols: list[str]):
    return df.select(F.struct(*[F.col(c) for c in cols]).alias("_s")).schema[
        "_s"
    ].dataType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    ``right_ts <= left_ts`` (backward as-of, inclusive). Right columns are
    null when no prior right row exists (left-join semantics).

    Timestamp columns must be mutually comparable (same numeric unit or both
    timestamps). ``tolerance`` (same unit as a numeric ts) drops matches
    older than ``left_ts - tolerance``. Non-key column names must be
    disjoint between the two inputs; ties at equal ``right_ts`` pick the
    greatest right payload struct (field order = right column order).
    """
    lpay = [c for c in left.columns if c not in on]
    rpay = [c for c in right.columns if c not in on]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"non-key columns must be disjoint; clash: {sorted(clash)}")
    l_t = _payload_struct_type(left, lpay)
    r_t = _payload_struct_type(right, rpay)

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*lpay).alias("_l"),
        F.lit(None).cast(r_t).alias("_r"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_t).alias("_l"),
        F.struct(*rpay).alias("_r"),
    )
    # right rows sort before left rows at equal _t (side 0 < 1) → inclusive
    # match; among right rows at equal _t the payload struct breaks the tie.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t"), F.col("_side"), F.col("_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    comb = l2.unionByName(r2).withColumn(
        "_m", F.last("_r", ignorenulls=True).over(w)
    )
    out = comb.where(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col(f"_m.{right_ts}") >= F.col("_t") - F.lit(tolerance),
                F.col("_m"),
            ),
        )
    return out.select(*on, "_l.*", "_m.*")


def lookback_count(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback: int,
    count_col: str = "n_matches",
) -> DataFrame:
    """For each left row, count right rows of the same key with
    ``right_ts ∈ [left_ts - lookback, left_ts]`` (inclusive band range
    join). ``left_ts``/``right_ts`` must be numeric (e.g. epoch micros) so
    the RANGE window frame can bound the interval.

    Returns the left rows plus ``count_col``.
    """
    lpay = [c for c in left.columns if c not in on]
    l_t = _payload_struct_type(left, lpay)
    l2 = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(0).alias("_w"),
        F.struct(*lpay).alias("_l"),
    )
    r2 = right.select(
        *on, F.col(right_ts).alias("_t"), F.lit(1).alias("_w"), F.lit(None).cast(l_t).alias("_l")
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").cast("long"))
        .rangeBetween(-int(lookback), Window.currentRow)
    )
    comb = l2.unionByName(r2).withColumn(
        "_n", F.sum("_w").over(w)
    )
    return comb.where(F.col("_l").isNotNull()).select(
        *on, "_l.*", F.col("_n").cast("long").alias(count_col)
    )


# ---------------------------------------------------------------------------
# driver registry (events corpus: last click before each error, clicks in
# the 10 minutes before each error)
# ---------------------------------------------------------------------------


def _raw_events(spark, sf_dir: str) -> DataFrame:
    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    from accumulo_wikisearch_spark.sources.events import read_events

    # ts_us is exact integer micros — identical to DuckDB's epoch_us(ts)
    return read_events(spark, sf_dir)


def _errors(ev: DataFrame) -> DataFrame:
    return ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id"), F.col("ts_us").alias("err_ts_us")
    )


def _clicks(ev: DataFrame) -> DataFrame:
    return ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("click_ts_us")
    )


def _asof_last_click(spark, sf_dir: str) -> DataFrame:
    ev = _raw_events(spark, sf_dir)
    out = asof_join(
        _errors(ev), _clicks(ev), ["user_id"], "err_ts_us", "click_ts_us"
    )
    # no-match → -1 (keeps the driver's hash compare null-free)
    return out.select(
        "event_id",
        "user_id",
        "err_ts_us",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce("click_ts_us", F.lit(-1)).alias("click_ts_us"),
    )


def _clicks_before_error(spark, sf_dir: str) -> DataFrame:
    ev = _raw_events(spark, sf_dir)
    return lookback_count(
        _errors(ev),
        _clicks(ev).select("user_id", "click_ts_us"),
        ["user_id"],
        "err_ts_us",
        "click_ts_us",
        lookback=600_000_000,  # 10 minutes in micros
        count_col="n_clicks",
    ).select("event_id", "user_id", "n_clicks")


def queries():
    return {
        "ev_asof_last_click": _asof_last_click,
        "ev_clicks_10min_before_error": _clicks_before_error,
    }


# Tie-break parity: the Spark plan orders right rows by (_t, payload struct)
# where the payload is (click_id, click_ts_us) — at equal ts the max
# click_id wins, which the ORDER BY below reproduces.
_ASOF_SQL = """
WITH err AS (
  SELECT event_id, user_id, epoch_us(ts) AS err_ts_us
  FROM events WHERE event_type = 'error'
), clk AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT e.event_id, e.user_id, e.err_ts_us, c.click_id, c.click_ts_us,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY c.click_ts_us DESC NULLS LAST, c.click_id DESC
         ) AS rn
  FROM err e LEFT JOIN clk c
    ON c.user_id = e.user_id AND c.click_ts_us <= e.err_ts_us
)
SELECT event_id, user_id, err_ts_us,
       coalesce(click_id, -1) AS click_id,
       coalesce(click_ts_us, -1) AS click_ts_us
FROM j WHERE rn = 1
"""

_LOOKBACK_SQL = """
WITH err AS (
  SELECT event_id, user_id, epoch_us(ts) AS err_ts_us
  FROM events WHERE event_type = 'error'
), clk AS (
  SELECT user_id, epoch_us(ts) AS click_ts_us
  FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, count(c.click_ts_us)::BIGINT AS n_clicks
FROM err e LEFT JOIN clk c
  ON c.user_id = e.user_id
 AND c.click_ts_us <= e.err_ts_us
 AND c.click_ts_us >= e.err_ts_us - 600000000
GROUP BY e.event_id, e.user_id
"""


def oracle_sql():
    return {
        "ev_asof_last_click": _ASOF_SQL,
        "ev_clicks_10min_before_error": _LOOKBACK_SQL,
    }
