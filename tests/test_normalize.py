"""Normalizer parity: Spark column vs Python literal vs reference fixture
pairs (FIXTURES.md §4; LcNoDiacriticsNormalizer.java:37-47)."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import (
    normalize_col,
    normalize_str,
    tokenize_col,
    hash60_col,
    HASH60_DUCKDB,
)

PAIRS = [
    ("Café", "cafe"),
    ("NIÑO", "nino"),
    ("ÀÉÎÕÜ", "aeiou"),
    ("plain", "plain"),
    ("MiXeD", "mixed"),
]


def test_normalize_str():
    for raw, want in PAIRS:
        assert normalize_str(raw) == want


def test_normalize_col_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _ in PAIRS], ["v"])
    got = [r["n"] for r in df.select(normalize_col("v").alias("n")).collect()]
    assert got == [w for _, w in PAIRS]


def test_tokenize_distinct(spark):
    df = spark.createDataFrame([("The  the dog\tDOG cat",)], ["t"])
    toks = df.select(tokenize_col("t").alias("x")).collect()[0]["x"]
    assert sorted(toks) == ["cat", "dog", "the"]


def test_hash60_matches_duckdb(spark, duck):
    vals = ["abc", "dup", "x y z", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", hash60_col("v").alias("h")).collect()}
    for v in vals:
        want = duck.execute(
            f"SELECT {HASH60_DUCKDB.format(expr='?')}", [v]
        ).fetchone()[0]
        assert got[v] == want, v
        assert got[v] >= 0

