"""Unit tests for the temporal join operators (asof_join, lookback_count)."""

import pytest
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.temporal import asof_join, lookback_count


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (key, left_id, lts)
            ("a", 1, 100),
            ("a", 2, 205),
            ("a", 3, 50),  # before any right row
            ("b", 4, 100),  # key with no right rows at all
        ],
        "k string, left_id int, lts long",
    )
    right = spark.createDataFrame(
        [
            # (key, right_id, rts)
            ("a", 10, 60),
            ("a", 11, 100),  # exact match with left_id=1
            ("a", 12, 100),  # tie at rts=100: greater right_id wins
            ("a", 13, 200),
        ],
        "k string, right_id int, rts long",
    )
    return left, right


def _rows(df):
    return {r["left_id"]: r for r in df.collect()}


def test_asof_backward_inclusive_and_ties(frames):
    left, right = frames
    out = _rows(asof_join(left, right, ["k"], "lts", "rts"))
    # exact-ts match is inclusive; tie at rts=100 picks max payload struct
    assert out[1]["right_id"] == 12 and out[1]["rts"] == 100
    assert out[2]["right_id"] == 13 and out[2]["rts"] == 200
    # left row before all right rows → nulls
    assert out[3]["right_id"] is None and out[3]["rts"] is None
    # key with no right rows → nulls
    assert out[4]["right_id"] is None


def test_asof_tolerance(frames):
    left, right = frames
    out = _rows(asof_join(left, right, ["k"], "lts", "rts", tolerance=5))
    assert out[2]["right_id"] == 13  # 205-200 = 5 ≤ 5 → kept
    assert out[1]["right_id"] == 12  # 100-100 = 0 → kept
    out2 = _rows(asof_join(left, right, ["k"], "lts", "rts", tolerance=4))
    assert out2[2]["right_id"] is None  # 5 > 4 → dropped


def test_asof_rejects_column_clash(frames, spark):
    left, _ = frames
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(left, left, ["k"], "lts", "lts")


def test_lookback_count(frames):
    left, right = frames
    out = _rows(
        lookback_count(left, right, ["k"], "lts", "rts", lookback=40, count_col="n")
    )
    # left_id=1 @100: right ts in [60,100] → 60,100,100 = 3
    assert out[1]["n"] == 3
    # left_id=2 @205: right ts in [165,205] → 200 = 1
    assert out[2]["n"] == 1
    # left_id=3 @50: [10,50] → none
    assert out[3]["n"] == 0
    # key b: no right rows
    assert out[4]["n"] == 0


def test_lookback_preserves_left_columns(frames):
    left, right = frames
    out = lookback_count(left, right, ["k"], "lts", "rts", lookback=40)
    assert set(out.columns) == {"k", "left_id", "lts", "n_matches"}
    assert out.count() == left.count()


def test_asof_randomized_against_brute_force(spark):
    """200×200 randomized fixture vs a brute-force reference that encodes
    the documented semantics (backward inclusive, max-(payload) tie-break)."""
    import random

    rng = random.Random(7)
    left_rows = [
        (f"k{rng.randrange(8)}", i, rng.randrange(0, 500)) for i in range(200)
    ]
    right_rows = [
        (f"k{rng.randrange(8)}", 1000 + i, rng.randrange(0, 500)) for i in range(200)
    ]
    left = spark.createDataFrame(left_rows, "k string, left_id long, lts long")
    right = spark.createDataFrame(right_rows, "k string, right_id long, rts long")
    got = {
        r["left_id"]: (r["right_id"], r["rts"])
        for r in asof_join(left, right, ["k"], "lts", "rts").collect()
    }

    for k, left_id, lts in left_rows:
        cands = [(rid, rts) for (rk, rid, rts) in right_rows if rk == k and rts <= lts]
        # latest rts wins (time-ordered window); at equal rts the payload
        # struct (right_id, rts) breaks the tie → max right_id
        expect = max(cands, key=lambda c: (c[1], c[0]), default=(None, None))
        assert got[left_id] == expect, (k, left_id, lts, expect, got[left_id])
