"""Batch event-analytics unit tests on tiny frames (the oracle gate covers
the full events table; these pin the semantics)."""

import datetime

from accumulo_wikisearch_spark.operators.analytics import retention_cohorts

WEEK = 604800


def test_retention_cohorts_offsets_and_distinct_users(spark):
    ts = lambda wk, extra=0: datetime.datetime.utcfromtimestamp(wk * WEEK + extra)
    rows = [
        # user 1: weeks 0, 0 (dup event), 2 → cohort 0, offsets {0, 2}
        (1, ts(0)), (1, ts(0, 60)), (1, ts(2)),
        # user 2: weeks 0, 1 → cohort 0, offsets {0, 1}
        (2, ts(0)), (2, ts(1)),
        # user 3: week 2 only → cohort 2, offset 0
        (3, ts(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (2, 0): 1}
