"""Unit tests for deterministic hash sampling/splitting."""

import pytest
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_split_deterministic_and_total(ids):
    a = hash_split(ids, "key", {"train": 90, "val": 5, "test": 5})
    b = hash_split(ids, "key", {"train": 90, "val": 5, "test": 5})
    assert a.collect() == b.collect()
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row assigned exactly once
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # roughly proportional (hash-uniform): train within ±5pp of 90%
    assert abs(counts["train"] / 2000 - 0.90) < 0.05


def test_split_rejects_bad_weights(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "key", {"train": 50, "val": 10})


def test_split_stable_under_repartition(ids):
    base = {r["key"]: r["split"] for r in hash_split(ids, "key", {"a": 50, "b": 50}).collect()}
    shuffled = {
        r["key"]: r["split"]
        for r in hash_split(ids.repartition(7), "key", {"a": 50, "b": 50}).collect()
    }
    assert base == shuffled  # membership is a pure function of the key


def test_stratified_fractions(ids):
    out = stratified_sample(ids, "key", "lang", {"en": 60, "de": 10})
    n_en_all = ids.where(F.col("lang") == "en").count()
    n_de_all = ids.where(F.col("lang") == "de").count()
    n_en = out.where(F.col("lang") == "en").count()
    n_de = out.where(F.col("lang") == "de").count()
    assert abs(n_en / n_en_all - 0.60) < 0.08
    assert abs(n_de / n_de_all - 0.10) < 0.08


def test_stratified_default_pct_zero_drops_unlisted(ids):
    out = stratified_sample(ids, "key", "lang", {"en": 100}, default_pct=0)
    assert out.where(F.col("lang") == "de").count() == 0
    assert out.where(F.col("lang") == "en").count() == ids.where(F.col("lang") == "en").count()


def test_salt_changes_membership(ids):
    a = {r["key"] for r in stratified_sample(ids, "key", "lang", {"en": 50, "de": 50}, salt="s1").collect()}
    b = {r["key"] for r in stratified_sample(ids, "key", "lang", {"en": 50, "de": 50}, salt="s2").collect()}
    assert a != b  # different salts draw different (deterministic) samples


def test_write_training_shards_deterministic_manifest(spark, sf_dir, tmp_path):
    from accumulo_wikisearch_spark.operators.sampling import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=4)
    m2 = write_training_shards(docs, str(tmp_path / "b"), n_shards=4)
    assert m1 == m2  # membership independent of run/order
    assert sum(s["n_docs"] for s in m1) == docs.count()
    assert {s["shard"] for s in m1} <= set(range(4))
    back = spark.read.parquet(str(tmp_path / "a"))
    assert back.select("doc_id").distinct().count() == docs.count()
    import json
    man = json.loads(open(tmp_path / "a" / "_MANIFEST.json").read())
    assert man == m1
