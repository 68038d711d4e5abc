"""Z-order layout: Morton value correctness, exact bucket enumeration,
and partition-pruned two-sided range scans."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.layout import (
    ZBITS,
    zbuckets_for_box,
    zvalue_col,
    read_zordered_box,
    write_zordered,
)


def _z_py(x, y, bits=ZBITS):
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zvalue_matches_python_interleave(spark):
    rows = spark.range(0, 500).select(
        (F.col("id") * 7 % 1024).alias("x"), (F.col("id") * 13 % 1024).alias("y")
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in rows.select(
            "x", "y", zvalue_col(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _z_py(x, y)


def test_zbuckets_cover_exactly_the_intersecting_rectangles():
    # the full domain must map to all buckets; a point to exactly one
    assert sorted(zbuckets_for_box(0, 1023, 0, 1023)) == list(range(16))
    assert len(zbuckets_for_box(5, 5, 7, 7)) == 1
    # a thin x-slab crosses every y-prefix but one x-prefix: with
    # bucket_bits=4 (2 x-bits × 2 y-bits) that is 4 buckets
    assert len(zbuckets_for_box(0, 200, 0, 1023)) == 4


def test_zordered_scan_prunes_and_matches_plain_filter(spark, sf_dir, tmp_path):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("vb")
    )
    path = str(tmp_path / "zstore")
    write_zordered(events, path, "user_id", "vb")
    got = read_zordered_box(spark, path, "user_id", 0, 200, "vb", 0, 100)
    want = events.where(
        F.col("user_id").between(0, 200) & F.col("vb").between(0, 100)
    )
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )
    # the bucket list must reach the scan as a PartitionFilter, and the
    # selective box must touch a strict subset of directories
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "zb" in seg
    assert len(zbuckets_for_box(0, 200, 0, 100)) < 16


def test_zvalue_stays_in_codegen_no_python_udf(spark):
    df = spark.range(0, 10).select(
        zvalue_col(F.col("id"), F.col("id") + 1).alias("z")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(1)" is the WholeStageCodegen marker in the toString form
    assert "*(1)" in plan


def test_out_of_domain_keys_raise_instead_of_aliasing(spark, tmp_path):
    import pytest as _pytest
    from pyspark.errors import PySparkException

    df = spark.range(0, 5).select(
        F.col("id").alias("a"), (F.col("id") + 2000).alias("b")  # b >= 2^10
    )
    with _pytest.raises(PySparkException, match="outside"):
        write_zordered(df, str(tmp_path / "bad"), "a", "b")
    # wider domain: same data writes fine
    write_zordered(df, str(tmp_path / "ok"), "a", "b", bits=11)
    got = read_zordered_box(
        spark, str(tmp_path / "ok"), "a", 0, 10, "b", 2000, 2010, bits=11
    )
    assert got.count() == 5
    # a box outside the domain raises rather than pruning against wraps
    with _pytest.raises(ValueError, match="outside the"):
        read_zordered_box(
            spark, str(tmp_path / "ok"), "a", 0, 10, "b", 2000, 5000, bits=11
        )
