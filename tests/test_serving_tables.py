"""Pins SERVING_TABLES (operators/ingest.py) to what persist() actually
caches, so bench.py's cache eviction (fresh_index_build →
unpersist_serving) can never drift from the real serving set again
(r13 ADVICE: the old hard-coded evict list in bench.py would silently
leave a renamed/added serving table cached, turning later index_build
reps into cache no-ops)."""

from pyspark.sql import DataFrame

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.ingest import (
    SERVING_TABLES,
    build_index,
)

# every DataFrame-valued attribute a WikisearchIndex carries
_ALL_DF_ATTRS = (
    "doc_fields",
    "field_index",
    "global_index",
    "reverse_index",
    "metadata",
    "term_index",
    "docs_wide",
    "documents",
)


def _tiny_index(spark):
    arts = spark.createDataFrame(
        [(i, "en", f"alpha beta doc{i}") for i in range(4)],
        "id long, language string, text string",
    )
    return build_index(arts, EngineConfig(), {}, unique_ids=True)


def _persisted_attrs(idx) -> set[str]:
    out = set()
    for name in _ALL_DF_ATTRS:
        df = getattr(idx, name, None)
        if isinstance(df, DataFrame) and df.storageLevel.useMemory:
            out.add(name)
    return out


def test_serving_tables_is_exactly_what_persist_caches(spark):
    idx = _tiny_index(spark)
    assert _persisted_attrs(idx) == set()
    idx.persist()
    try:
        assert _persisted_attrs(idx) == set(SERVING_TABLES)
        # the shared tokenized base is cached too (and covered by
        # unpersist_serving) but is not a named serving table
        assert idx._tokenized is not None
        assert idx._tokenized.storageLevel.useMemory
    finally:
        idx.unpersist_serving()


def test_unpersist_serving_leaves_nothing_cached_and_rearms_persist(spark):
    idx = _tiny_index(spark)
    idx.persist()
    idx.unpersist_serving()
    assert _persisted_attrs(idx) == set()
    assert not idx._tokenized.storageLevel.useMemory
    # persist() must be re-armable (bench builds a FRESH engine per rep,
    # but the contract should hold for reuse too)
    idx.persist()
    try:
        assert _persisted_attrs(idx) == set(SERVING_TABLES)
    finally:
        idx.unpersist_serving()
