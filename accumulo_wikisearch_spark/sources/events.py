"""Shared loader for the `events` table.

The driver's testdata has shipped the ``ts`` column under two physical
types across rounds: nanos-since-epoch INT64 (read as LONG under
``spark.sql.legacy.parquet.nanosAsLong``) and plain ``timestamp[us]``
(read as TIMESTAMP_NTZ). Every consumer goes through :func:`read_events`
so the rest of the engine sees one canonical shape:

- ``ts``     TIMESTAMP (session-tz UTC, so NTZ wall-clock == epoch instant)
- ``ts_us``  BIGINT micros since epoch (exact; integer arithmetic only)

This adaptivity is scan-local (no shuffle) and costs one projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet and normalize ``ts`` to (timestamp, micros-long).

    Session timezone is pinned to UTC (session.py), so casting a
    TIMESTAMP_NTZ wall-clock to TIMESTAMP preserves the stored instant and
    matches DuckDB's ``epoch_us(ts)`` on the same file.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":
        # nanos-since-epoch LONG: integer div (never float /) — an ~1e18
        # nanos value loses precision below double's 53-bit mantissa
        ev = ev.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
            "ts_us", F.unix_micros(F.col("ts"))
        )
    return ev
