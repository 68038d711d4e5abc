"""The sketch × streaming maintenance matrix's delivery-semantics
contracts: Bloom's or-merge is IDEMPOTENT (an at-least-once redelivery
is a no-op on the store), while CMS's sum-merge is not (a redelivered
batch visibly shifts counts — which is exactly what its oracle hash
check exploits to catch exactly-once violations)."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.sketches import (
    bloom_build,
    bloom_merge,
    cms_build,
    cms_merge,
)


def _batches(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.where(F.col("event_id") % 2 == 0),
        events.where(F.col("event_id") % 2 == 1),
    )


def test_bloom_store_unchanged_when_batch_double_fed(spark, sf_dir):
    b0, b1 = _batches(spark, sf_dir)
    store = bloom_merge(bloom_build(b0, "user_id"), bloom_build(b1, "user_id"))
    # redeliver batch 0 into the finished store: bit_or fixpoint
    refed = bloom_merge(store, bloom_build(b0, "user_id"))
    want = {(r["word"], r["bits"]) for r in store.collect()}
    got = {(r["word"], r["bits"]) for r in refed.collect()}
    assert got == want


def test_cms_store_shifts_when_batch_double_fed(spark, sf_dir):
    b0, b1 = _batches(spark, sf_dir)
    store = cms_merge(cms_build(b0, "user_id"), cms_build(b1, "user_id"))
    refed = cms_merge(store, cms_build(b0, "user_id"))
    want = {(r["row"], r["col"], r["cnt"]) for r in store.collect()}
    got = {(r["row"], r["col"], r["cnt"]) for r in refed.collect()}
    # NOT idempotent: the redelivery must be visible (this is the property
    # that makes the stream-replay hash check a delivery-semantics gate)
    assert got != want


def test_bloom_stream_replay_equals_batch_sketch(spark, sf_dir):
    from accumulo_wikisearch_spark.streaming.analytics import replay_stream_bloom

    got = {
        (r["word"], r["bits"]) for r in replay_stream_bloom(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {(r["word"], r["bits"]) for r in bloom_build(events, "user_id").collect()}
    assert got == want


def test_hist_store_shifts_when_batch_double_fed(spark, sf_dir):
    from accumulo_wikisearch_spark.operators.sketches import hist_build, hist_merge

    b0, b1 = _batches(spark, sf_dir)
    store = hist_merge(
        hist_build(b0, "event_type", "value"), hist_build(b1, "event_type", "value")
    )
    refed = hist_merge(store, hist_build(b0, "event_type", "value"))
    want = {(r["grp"], r["bucket"], r["cnt"]) for r in store.collect()}
    got = {(r["grp"], r["bucket"], r["cnt"]) for r in refed.collect()}
    assert got != want  # additive like CMS: redelivery is visible


def test_hist_stream_replay_equals_batch_sketch(spark, sf_dir):
    from accumulo_wikisearch_spark.operators.sketches import hist_build
    from accumulo_wikisearch_spark.streaming.analytics import replay_stream_hist

    got = {
        (r["grp"], r["bucket"], r["cnt"])
        for r in replay_stream_hist(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = {
        (r["grp"], r["bucket"], r["cnt"])
        for r in hist_build(events, "event_type", "value").collect()
    }
    assert got == want
