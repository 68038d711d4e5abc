"""HLL sketch: register semantics, merge distributivity, estimate accuracy."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.sketches import (
    hll_estimate,
    hll_registers,
    merge_registers,
)


def test_registers_bounded_and_merge_equals_direct(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    direct = hll_registers(df, "g", "v")
    assert direct.count() <= 3 * 256
    # distributivity: sketch disjoint halves, merge with MAX == direct
    a = hll_registers(df.where(F.col("v") % 2 == 0), "g", "v")
    b = hll_registers(df.where(F.col("v") % 2 == 1), "g", "v")
    merged = merge_registers(a, b)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_estimate_within_tolerance(spark):
    # 10k distinct values in one group: HLL with m=256 has ~6.5% stderr;
    # 20% is a >3-sigma bound, so this is deterministic-stable, not flaky
    # (the hash is fixed, so the estimate is a constant anyway)
    df = spark.range(0, 10_000).select(
        F.lit("g").alias("g"), (F.col("id") * 7919 + 13).alias("v")
    )
    est = hll_estimate(hll_registers(df, "g", "v")).collect()[0]["est_distinct"]
    assert 8_000 <= est <= 12_000


def test_estimate_small_range_linear_counting(spark):
    df = spark.range(0, 40).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = hll_estimate(hll_registers(df, "g", "v")).collect()[0]["est_distinct"]
    assert 30 <= est <= 50


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from accumulo_wikisearch_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(0, 500).select((F.col("id") * 13 + 5).alias("k"))
    bloom = bloom_build(members, "k")
    assert bloom.count() <= 64  # bitset stays tiny regardless of key count
    # every member probes positive — Bloom never false-negatives
    hits = bloom_probe(members, "k", bloom)
    assert hits.where(F.col("in_bloom") == 0).count() == 0
    # disjoint non-members: fp rate well under 50% at this load factor
    others = spark.range(0, 1000).select((F.col("id") * 13 + 6).alias("k"))
    fp = bloom_probe(others, "k", bloom).where(F.col("in_bloom") == 1).count()
    assert fp < 500


def test_bloom_partial_filters_merge_with_bit_or(spark):
    from accumulo_wikisearch_spark.operators.sketches import bloom_build, bloom_merge

    all_keys = spark.range(0, 400).select(F.col("id").alias("k"))
    direct = bloom_build(all_keys, "k")
    a = bloom_build(all_keys.where(F.col("k") < 200), "k")
    b = bloom_build(all_keys.where(F.col("k") >= 200), "k")
    merged = bloom_merge(a, b)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_one_sided_error_and_additive_merge(spark):
    from accumulo_wikisearch_spark.operators.sketches import cms_build, cms_estimate

    # skewed stream: key 0 appears 500x, keys 1..200 once each
    heavy = spark.range(0, 500).select(F.lit(0).cast("long").alias("k"))
    tail = spark.range(1, 201).select(F.col("id").alias("k"))
    stream = heavy.unionByName(tail)
    cms = cms_build(stream, "k")
    assert cms.count() <= 3 * 1024
    truth = {r["k"]: r["c"] for r in stream.groupBy("k").agg(F.count("*").alias("c")).collect()}
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(stream.select("k").distinct(), "k", cms).collect()
    }
    # never under the true count; heavy key essentially exact at this load
    assert all(est[k] >= truth[k] for k in truth)
    assert est[0] >= 500 and est[0] <= 520
    # additive merge: half-stream sketches summed == direct sketch
    from accumulo_wikisearch_spark.operators.sketches import cms_merge

    a = cms_build(stream.where(F.col("k") % 2 == 0), "k")
    b = cms_build(stream.where(F.col("k") % 2 == 1), "k")
    merged = cms_merge(a, b)
    assert merged.exceptAll(cms).count() == 0
    assert cms.exceptAll(merged).count() == 0


def test_cms_heavy_hitters_exactly_matches_having_query(spark):
    from accumulo_wikisearch_spark.operators.sketches import cms_heavy_hitters

    heavy = spark.range(0, 300).select((F.col("id") % 3).alias("k"))  # 3 keys x100
    tail = spark.range(10, 500).select(F.col("id").alias("k"))  # 490 keys x1
    stream = heavy.unionByName(tail)
    got = cms_heavy_hitters(stream, "k", 50)
    want = (
        stream.groupBy("k").agg(F.count("*").alias("cnt")).where(F.col("cnt") >= 50)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # tiny sketch (every estimate inflated): answer still exact
    got_tiny = cms_heavy_hitters(stream, "k", 50, width=4, depth=1)
    assert got_tiny.exceptAll(want).count() == 0
    assert want.exceptAll(got_tiny).count() == 0


def test_string_keys_route_through_hash60_not_null(spark):
    # the old behavior cast strings to NULL, collapsing the sketch into a
    # single register; with hash60 routing, distinct strings spread over
    # buckets and the estimate tracks the true cardinality
    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        cms_estimate,
        cms_build,
    )

    df = spark.range(0, 2000).select(
        F.lit("g").alias("g"), F.concat(F.lit("key-"), F.col("id")).alias("v")
    )
    regs = hll_registers(df, "g", "v")
    assert regs.count() > 100  # NULL-cast would have produced exactly 1 row
    est = hll_estimate(regs).collect()[0]["est_distinct"]
    assert 1_600 <= est <= 2_400

    members = df.select(F.col("v").alias("k")).limit(200)
    bloom = bloom_build(members, "k")
    assert bloom_probe(members, "k", bloom).where(F.col("in_bloom") == 0).count() == 0

    cms = cms_build(df, "v")
    ests = cms_estimate(df.limit(50), "v", cms)
    # one-sided: every estimate >= true count (1 per key here)
    assert ests.where(F.col("est_count") < 1).count() == 0


def test_unsupported_key_type_raises(spark):
    import pytest as _pytest

    from accumulo_wikisearch_spark.operators.sketches import bloom_build, cms_build

    df = spark.range(0, 10).select(
        F.lit("g").alias("g"), (F.col("id") / 2.0).alias("v")
    )
    with _pytest.raises(TypeError, match="unsupported type"):
        hll_registers(df, "g", "v")
    with _pytest.raises(TypeError, match="unsupported type"):
        bloom_build(df, "v")
    with _pytest.raises(TypeError, match="unsupported type"):
        cms_build(df, "v")


def test_negative_keys_match_duckdb_oracle(spark):
    # the SQL replay must use the pmod form — DuckDB's sign-preserving %
    # silently diverged on negative keys before r7 (r6 ADVICE)
    import duckdb

    from accumulo_wikisearch_spark.operators.sketches import _reg_sql

    df = spark.range(0, 400).select(
        F.lit("g").alias("g"), (F.col("id") * 104729 - 20_000_000).alias("v")
    )
    assert df.where(F.col("v") < 0).count() > 0
    got = {
        (r["grp"], r["bucket"]): r["rho"]
        for r in hll_registers(df, "g", "v").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT 'g' AS g, (range * 104729 - 20000000) AS v"
        " FROM range(0, 400)"
    )
    want = {
        (grp, b): rho
        for grp, b, rho, _m in con.execute(_reg_sql("t", "g", "v")).fetchall()
    }
    assert got == want


def test_heavy_hitters_plan_has_no_distinct_no_join(spark):
    # the candidate prefilter is a literal bit test — the returned plan
    # must contain exactly one aggregation exchange (the candidate-only
    # exact count) and neither a join nor a full-key distinct
    from accumulo_wikisearch_spark.operators.sketches import cms_heavy_hitters

    stream = spark.range(0, 300).select((F.col("id") % 5).alias("k"))
    got = cms_heavy_hitters(stream, "k", 50)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_cms_merge_additive_and_not_idempotent(spark):
    from accumulo_wikisearch_spark.operators.sketches import cms_build, cms_merge

    df = spark.range(0, 1000).select((F.col("id") % 7).alias("k"))
    a = cms_build(df.where(F.col("id") % 2 == 0), "k")
    b = cms_build(df.where(F.col("id") % 2 == 1), "k")
    direct = cms_build(df, "k")
    merged = cms_merge(a, b)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # additive ⇒ NOT idempotent: double-merging a slice shifts counts
    double = cms_merge(a, a, b)
    assert double.exceptAll(direct).count() > 0


def test_bloom_merge_bit_or_and_idempotent(spark):
    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    keys = spark.range(0, 400).select((F.col("id") * 31 + 7).alias("k"))
    a = bloom_build(keys.where(F.col("k") % 2 == 0), "k")
    b = bloom_build(keys.where(F.col("k") % 2 == 1), "k")
    direct = bloom_build(keys, "k")
    merged = bloom_merge(a, b)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # idempotent: overlapping slices are harmless
    over = bloom_merge(a, a, b, direct)
    assert over.exceptAll(direct).count() == 0
    # merged filter still has no false negatives
    assert bloom_probe(keys, "k", merged).where(F.col("in_bloom") == 0).count() == 0


def test_hist_quantile_within_bucket_width(spark):
    from accumulo_wikisearch_spark.operators.sketches import (
        hist_build,
        hist_merge,
        hist_quantile,
    )

    # uniform 0..500: median ≈ 250, p90 ≈ 450; bucket width = 2
    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), (F.col("id") % 500).cast("double").alias("v")
    )
    hist = hist_build(df, "g", "v")
    assert hist.count() <= 256
    med = hist_quantile(hist, 0.5).collect()[0]["est"]
    p90 = hist_quantile(hist, 0.9).collect()[0]["est"]
    assert abs(med - 250) <= 2 + 1e-9, med
    assert abs(p90 - 450) <= 2 + 1e-9, p90
    # merge of disjoint halves == direct build (additive algebra)
    a = hist_build(df.where(F.col("id") % 2 == 0), "g", "v")
    b = hist_build(df.where(F.col("id") % 2 == 1), "g", "v")
    merged = hist_merge(a, b)
    assert merged.exceptAll(hist).count() == 0
    assert hist.exceptAll(merged).count() == 0
    # clamp: values >= hi land in the last bucket, none dropped
    big = spark.range(0, 10).select(
        F.lit("g").alias("g"), (F.col("id") + 600).cast("double").alias("v")
    )
    hb = hist_build(big, "g", "v").collect()
    assert len(hb) == 1 and hb[0]["bucket"] == 255 and hb[0]["cnt"] == 10


def test_hist_build_is_single_exchange(spark):
    from accumulo_wikisearch_spark.operators.sketches import hist_build

    df = spark.range(0, 100).select(
        F.lit("g").alias("g"), (F.col("id") % 50).cast("double").alias("v")
    )
    plan = hist_build(df, "g", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1 and "Join" not in plan


def test_hist_clamps_symmetrically_no_rows_dropped(spark):
    from accumulo_wikisearch_spark.operators.sketches import hist_build

    # values straddling BOTH domain edges: below-lo clamps to bucket 0
    # (not dropped — the r7 asymmetry), >= hi clamps to the last bucket
    df = spark.range(0, 30).select(
        F.lit("g").alias("g"),
        (F.col("id").cast("double") * 100 - 700).alias("v"),  # -700..2200
    )
    rows = {r["bucket"]: r["cnt"] for r in hist_build(df, "g", "v").collect()}
    assert sum(rows.values()) == 30  # lossless over all of R
    assert rows[0] >= 7  # the 7 below-lo values joined bucket 0
    assert rows[255] >= 17  # the >= 512 values joined the last bucket


def test_hist_auto_domain_full_resolution(spark):
    from accumulo_wikisearch_spark.operators.sketches import (
        hist_build,
        hist_build_auto,
        hist_quantile,
    )

    # values in [10000, 10500): the FIXED default domain would clamp all
    # of them into bucket 255; the auto domain spreads them
    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"),
        (F.col("id") % 500 + 10000).cast("double").alias("v"),
    )
    fixed = hist_build(df, "g", "v").collect()
    assert len(fixed) == 1 and fixed[0]["bucket"] == 255
    auto = hist_build_auto(df, "g", "v")
    assert auto.count() > 100
    # the table CARRIES its derived domain — no need to re-supply it
    med = hist_quantile(auto, 0.5).collect()[0]["est"]
    assert abs(med - 10250) <= 3, med
    # degenerate all-equal column: one bucket, no divide-by-zero
    same = spark.range(0, 9).select(
        F.lit("g").alias("g"), F.lit(7.25).alias("v")
    )
    srows = hist_build_auto(same, "g", "v").collect()
    assert len(srows) == 1 and srows[0]["cnt"] == 9


def test_cms_candidate_keys_bounded_and_exact_set(spark):
    from accumulo_wikisearch_spark.operators.sketches import (
        cms_build,
        cms_candidate_keys,
        cms_estimate,
    )

    # keys 0..4 appear 60x each, keys 100..199 once each
    hot = spark.range(0, 300).select((F.col("id") % 5).alias("k"))
    cold = spark.range(100, 200).select(F.col("id").alias("k"))
    df = hot.unionByName(cold)
    cms = cms_build(df, "k")
    cand = cms_candidate_keys(df, "k", 50, cms=cms)
    got = {r["k"] for r in cand.collect()}
    # every truly-hot key MUST be a candidate (estimates never undercount)
    assert got >= {0, 1, 2, 3, 4}
    # candidates are exactly the keys whose estimate clears the bar
    ests = {
        r["k"]: r["est_count"]
        for r in cms_estimate(
            df.select("k").distinct(), "k", cms
        ).collect()
    }
    assert got == {k for k, e in ests.items() if e >= 50}
    # and the probe plan is filter-then-distinct, never a join
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_hist_domain_rides_table_and_mismatch_raises(spark):
    """Two auto-domain histograms over different slices carry different
    [lo, hi] — summing their buckets would be garbage (bucket k means a
    different value interval in each), so hist_merge must raise; and
    hist_quantile must reject explicit args that contradict the table's
    own domain instead of silently rescaling estimates."""
    import pytest as _pytest

    from accumulo_wikisearch_spark.operators.sketches import (
        hist_build,
        hist_build_auto,
        hist_merge,
        hist_quantile,
    )

    lo_slice = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    hi_slice = spark.range(5000, 5100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    a = hist_build_auto(lo_slice, "g", "v")  # domain ≈ [0, 99]
    b = hist_build_auto(hi_slice, "g", "v")  # domain ≈ [5000, 5099]
    with _pytest.raises(ValueError, match="mismatched histogram domains"):
        hist_merge(a, b)
    # same slices under ONE shared domain merge fine
    m = hist_merge(
        hist_build(lo_slice, "g", "v", 0.0, 5100.0),
        hist_build(hi_slice, "g", "v", 0.0, 5100.0),
    )
    assert m.agg(F.sum("cnt")).first()[0] == 200
    # quantile args that contradict the carried domain raise
    with _pytest.raises(ValueError, match="contradicts"):
        hist_quantile(a, 0.5, lo=0.0, hi=100.0)


def test_hist_guards_catch_poisoned_union_and_allow_empty_merge(spark):
    """Two defense layers beyond the eager metadata check: (1) a
    hand-built unionByName carries ONE side's schema metadata for mixed
    rows — the in-pass guards must raise at action instead of silently
    blending domains; (2) an EMPTY auto-built histogram carries a
    placeholder domain that must not veto a well-defined merge (it
    contributes no rows)."""
    import pytest as _pytest
    from pyspark.errors import PySparkException

    from accumulo_wikisearch_spark.operators.sketches import (
        hist_build_auto,
        hist_merge,
        hist_quantile,
    )

    lo_slice = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    hi_slice = spark.range(5000, 5100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    a = hist_build_auto(lo_slice, "g", "v")
    b = hist_build_auto(hi_slice, "g", "v")
    poisoned = a.unionByName(b)  # schema metadata = a's domain, rows = both
    with _pytest.raises(PySparkException, match="different histogram domain"):
        hist_quantile(poisoned, 0.5).collect()
    with _pytest.raises(PySparkException, match="different histogram domain"):
        hist_merge(poisoned).collect()
    # empty slice: placeholder domain, zero rows — merge must succeed
    empty = hist_build_auto(lo_slice.where(F.lit(False)), "g", "v")
    m = hist_merge(a, empty)
    assert m.agg(F.sum("cnt")).first()[0] == 100


def test_sketch_sizing_mismatch_merges_raise(spark):
    """The r10 siblings of the histogram-domain fix: Bloom/CMS/HLL tables
    carry their sizing, and a mixed-sizing merge raises instead of
    silently corrupting (a blended Bloom bitset can FALSE-NEGATIVE — the
    one error the filter promises never to make; a blended CMS can
    undercount; blended HLL registers skew every estimate)."""
    import pytest as _pytest

    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        cms_build,
        cms_merge,
        merge_registers,
    )

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="mismatched Bloom sizings"):
        bloom_merge(bloom_build(keys, "k", n_words=64), bloom_build(keys, "k", n_words=32))
    with _pytest.raises(ValueError, match="mismatched Bloom sizings"):
        bloom_merge(
            bloom_build(keys, "k", n_hashes=3), bloom_build(keys, "k", n_hashes=4)
        )
    with _pytest.raises(ValueError, match="mismatched CMS sizings"):
        cms_merge(cms_build(keys, "k", width=1024), cms_build(keys, "k", width=512))
    df = keys.select(F.lit("g").alias("g"), F.col("k").alias("v"))
    with _pytest.raises(ValueError, match="mismatched HLL sizings"):
        merge_registers(
            hll_registers(df, "g", "v", n_buckets=256),
            hll_registers(df, "g", "v", n_buckets=128),
        )


def test_sketch_sizing_probe_contradiction_raises(spark):
    """Probe/estimate endpoints are as dangerous as merges: probing a
    Bloom filter or CMS with the wrong geometry reads the wrong bits/
    cells. Explicit arguments that contradict the table's stamped sizing
    raise; omitted arguments resolve FROM the table (so a non-default
    build probes correctly with no extra caller bookkeeping)."""
    import pytest as _pytest

    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        cms_build,
        cms_candidate_keys,
        cms_estimate,
    )

    keys = spark.range(0, 300).select(F.col("id").alias("k"))
    bloom32 = bloom_build(keys, "k", n_words=32)
    # args omitted: sizing comes from the table — still no false negatives
    assert bloom_probe(keys, "k", bloom32).where(F.col("in_bloom") == 0).count() == 0
    with _pytest.raises(ValueError, match="contradicts"):
        bloom_probe(keys, "k", bloom32, n_words=64)
    cms512 = cms_build(keys, "k", width=512)
    # args omitted: estimates resolve the build's geometry — never undercount
    ests = cms_estimate(keys, "k", cms512)
    assert ests.where(F.col("est_count") < 1).count() == 0
    with _pytest.raises(ValueError, match="contradicts"):
        cms_estimate(keys, "k", cms512, width=1024)
    with _pytest.raises(ValueError, match="contradicts"):
        cms_candidate_keys(keys, "k", 5, cms=cms512, width=1024)
    df = keys.select(F.lit("g").alias("g"), F.col("k").alias("v"))
    regs128 = hll_registers(df, "g", "v", n_buckets=128)
    est = hll_estimate(regs128).collect()[0]["est_distinct"]
    assert 200 <= est <= 400  # resolved m=128 from the table
    with _pytest.raises(ValueError, match="contradicts"):
        hll_estimate(regs128, n_buckets=256)


def test_sketch_sizing_poisoned_union_guard(spark):
    """A hand-built unionByName carries ONE side's schema metadata for
    mixed rows — the eager check passes, so the row-local in-pass guard
    must raise at action time (same defense layer as the histogram
    domain guard, now on all three siblings)."""
    import pytest as _pytest
    from pyspark.errors import PySparkException

    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        cms_build,
        cms_merge,
        merge_registers,
    )

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    pb = bloom_build(keys, "k", n_words=64).unionByName(
        bloom_build(keys, "k", n_words=32)
    )
    with _pytest.raises(PySparkException, match="different Bloom sizing"):
        bloom_merge(pb).collect()
    pc = cms_build(keys, "k", width=1024).unionByName(
        cms_build(keys, "k", width=512)
    )
    with _pytest.raises(PySparkException, match="different CMS sizing"):
        cms_merge(pc).collect()
    df = keys.select(F.lit("g").alias("g"), F.col("k").alias("v"))
    pr = hll_registers(df, "g", "v", n_buckets=256).unionByName(
        hll_registers(df, "g", "v", n_buckets=128)
    )
    with _pytest.raises(PySparkException, match="different n_buckets"):
        merge_registers(pr).collect()


def test_sketch_sizing_survives_parquet_and_legacy_tables_still_work(spark, tmp_path):
    """(1) Sizing metadata round-trips parquet, so at-rest sketch stores
    validate via the schema fast path; (2) pre-sizing tables (no bf_*/
    cms_*/hll_m columns) keep the historical caller's-contract behavior
    — old stores don't break."""
    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        bloom_probe,
        cms_merge,
        merge_registers,
    )

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bloom_build(keys, "k", n_words=32).write.parquet(str(tmp_path / "b"))
    back = spark.read.parquet(str(tmp_path / "b"))
    assert back.schema["bf_words"].metadata.get("v") == 32
    # probe resolves the non-default sizing from the round-tripped table
    assert bloom_probe(keys, "k", back).where(F.col("in_bloom") == 0).count() == 0
    merged = bloom_merge(back, back)  # idempotent, same sizing — fine
    assert merged.schema["bf_words"].metadata.get("v") == 32
    # legacy tables: plain (word, bits) / (row, col, cnt) / (grp, bucket, rho)
    legacy_bloom = back.select("word", "bits")
    lm = bloom_merge(legacy_bloom, legacy_bloom)
    assert lm.columns == ["word", "bits"]
    legacy_regs = spark.createDataFrame(
        [("g", 1, 3), ("g", 2, 5)], "grp string, bucket int, rho int"
    )
    assert merge_registers(legacy_regs, legacy_regs).count() == 2
    legacy_cms = spark.createDataFrame(
        [(1, 7, 4)], "row int, col int, cnt bigint"
    )
    assert cms_merge(legacy_cms, legacy_cms).first()["cnt"] == 8


def test_mixed_legacy_and_sized_merge_raises_clearly(spark):
    """r10 review: a pre-sizing store merged with a freshly built sized
    sketch used to die inside unionByName's schema resolution — neither
    the legacy contract nor a useful message. The mix must raise the
    migration error BEFORE the union; all-legacy inputs keep the old
    behavior (covered in test_sketch_sizing_survives_parquet...)."""
    import pytest as _pytest

    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        cms_build,
        cms_merge,
        merge_registers,
    )

    keys = spark.range(0, 50).select(F.col("id").alias("k"))
    sized_bloom = bloom_build(keys, "k")
    legacy_bloom = sized_bloom.select("word", "bits")
    with _pytest.raises(ValueError, match="legacy.*sized|pre-sizing"):
        bloom_merge(sized_bloom, legacy_bloom)
    sized_cms = cms_build(keys, "k")
    with _pytest.raises(ValueError, match="legacy"):
        cms_merge(sized_cms.select("row", "col", "cnt"), sized_cms)
    df = keys.select(F.lit("g").alias("g"), F.col("k").alias("v"))
    sized_regs = hll_registers(df, "g", "v")
    with _pytest.raises(ValueError, match="legacy"):
        merge_registers(sized_regs, sized_regs.select("grp", "bucket", "rho"))


def test_probe_endpoints_reject_poisoned_tables(spark):
    """The probe/estimate endpoints carry the same row-local guard as
    the merges: a metadata-poisoned union (schema says one sizing, rows
    carry two) must raise at action instead of probing minority-sizing
    cells — for Bloom that failure mode is a FALSE NEGATIVE, for CMS an
    undercount, for HLL a wrong-m estimate."""
    import pytest as _pytest
    from pyspark.errors import PySparkException

    from accumulo_wikisearch_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        cms_build,
        cms_candidate_keys,
        cms_estimate,
    )

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    pb = bloom_build(keys, "k", n_words=64).unionByName(
        bloom_build(keys, "k", n_words=32)
    )
    with _pytest.raises(PySparkException, match="different sizing"):
        bloom_probe(keys, "k", pb).collect()
    pc = cms_build(keys, "k", width=1024).unionByName(
        cms_build(keys, "k", width=512)
    )
    with _pytest.raises(PySparkException, match="different sizing"):
        cms_estimate(keys, "k", pc).collect()
    with _pytest.raises(PySparkException, match="different sizing"):
        cms_candidate_keys(keys, "k", 1, cms=pc).collect()
    # the r10 second-pass hole: minority-sizing cells all SUB-threshold
    # (each key once in the 512 build, threshold far above) must STILL
    # raise — a post-filter guard would never see them and silently drop
    # that build's hot keys from the candidate set
    hot = spark.range(0, 500).select(F.lit(7).cast("long").alias("k"))
    pc2 = cms_build(hot, "k", width=1024).unionByName(
        cms_build(keys, "k", width=512)
    )
    with _pytest.raises(PySparkException, match="different sizing"):
        cms_candidate_keys(hot, "k", 400, cms=pc2).collect()
    df = keys.select(F.lit("g").alias("g"), F.col("k").alias("v"))
    pr = hll_registers(df, "g", "v", n_buckets=256).unionByName(
        hll_registers(df, "g", "v", n_buckets=128)
    )
    with _pytest.raises(PySparkException, match="different sizing"):
        hll_estimate(pr).collect()
