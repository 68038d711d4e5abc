"""Corpus adapters: structured tables → the engine's ``articles`` contract.

The reference ingests Wikipedia XML (ArticleExtractor.java); our test corpus
is the driver's ``documents.parquet`` (doc_id, text, lang, source, n_chars).
Mapping: id=doc_id, language=lang, scalar fields ID/SOURCE/NCHARS, and TEXT
tokenized from ``text``. The engine itself is corpus-agnostic — any
DataFrame with (id, language, text, scalars) ingests the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.config import EngineConfig

SCALAR_FIELDS = {"ID": "id", "SOURCE": "source", "NCHARS": "n_chars", "LANG": "language"}


def _serving_width(parquet_path: str, spark: SparkSession) -> int:
    """Partition count for the cached per-query serving tables, sized by
    DATA (≈32 MB of uncompressed corpus per partition, assuming ~4×
    parquet compression) and capped at the core count.  A 5k-doc test
    corpus lands on 1; a 100 TB corpus saturates the cap, where the
    build's own split count already exceeds it and persist()'s
    only-narrow gate makes this a no-op."""
    import os

    cores = spark.sparkContext.defaultParallelism
    p = parquet_path
    try:
        if os.path.isdir(p):
            nbytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(p)
                for f in fs
            )
        else:
            nbytes = os.path.getsize(p)
    except OSError:
        # non-local filesystem (s3/hdfs URI): size unknown — return the
        # cap; persist()'s only-narrow gate then makes this a no-op
        return cores
    return max(1, min(cores, (nbytes * 4) // (32 << 20)))


def _widen(df: DataFrame) -> DataFrame:
    """Repartition an under-parallel scan up to the session's core count.

    A small corpus arrives as ONE parquet split (<maxPartitionBytes), which
    would serialize the tokenize pass, the docs_wide pivot, and every
    per-query docs_wide scan on a single task. One tiny shuffle at load
    buys full-width parallelism everywhere downstream. At real scale the
    input has ≥cores splits already and this is a no-op — the gate makes
    the local/bench case match the cluster execution shape instead of
    penalizing it."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # cheap probe: the plan here is a bare scan+select, so the .rdd
    # conversion costs ~ms (unlike probing a built index plan)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return _widen(
        docs.select(
            F.col("doc_id").alias("id"),
            F.col("lang").alias("language"),
            "text",
            "source",
            "n_chars",
        )
    )


# Engine cache keyed by (corpus, sf_dir, config) so a batch of queries
# against the same scale factor builds the index once (the reference's
# ingest is likewise a one-time batch; queries share the built tables).
_ENGINES: dict[tuple, Wikisearch] = {}


def get_engine(
    spark: SparkSession, sf_dir: str, config: EngineConfig | None = None
) -> Wikisearch:
    # TEXT is unevaluated (trusted from the index when coverage is exact),
    # matching the reference's query setup (Query.java:245 sets TEXT)
    config = config or EngineConfig(unevaluated_fields=frozenset({"TEXT"}))
    key = ("documents", sf_dir, config)
    eng = _ENGINES.get(key)
    if eng is None:
        articles = load_articles(spark, sf_dir)
        # doc_id is unique in documents.parquet → zero-shuffle pivot path
        eng = Wikisearch.ingest(articles, config, SCALAR_FIELDS, unique_ids=True)
        # docs_wide inherits articles' width through the narrow pivot —
        # pass it so persist() needn't analyze the pivot plan to learn it
        eng.index.persist(
            _serving_width(f"{sf_dir}/documents.parquet", spark),
            current_partitions=articles.rdd.getNumPartitions(),
        )
        _ENGINES[key] = eng
    return eng


# --- events corpus: a second ingest source with timestamp-bearing fields ---
# Demonstrates the engine is corpus-agnostic (any structured table ingests);
# TS is an ISO-format string field, so string-ordered index ranges match the
# reference's treatment of timestamps as normalized strings
# (ArticleExtractor.java:40 parses ISO-8601; index stores strings).

EVENT_SCALAR_FIELDS = {
    "ID": "id",
    "EVENT_TYPE": "event_type",
    "USER_ID": "user_id",
    "TS": "ts_str",
}


def load_event_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accumulo_wikisearch_spark.sources.events import read_events

    ev = read_events(spark, sf_dir)
    ts = F.col("ts")
    return _widen(
        ev.select(
            F.col("event_id").alias("id"),
            F.lit("default").alias("language"),
            F.col("event_type").alias("text"),  # TEXT = the type token
            "event_type",
            "user_id",
            F.date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        )
    )


def get_events_engine(
    spark: SparkSession, sf_dir: str, config: EngineConfig | None = None
) -> Wikisearch:
    config = config or EngineConfig()
    key = ("events", sf_dir, config)
    eng = _ENGINES.get(key)
    if eng is None:
        arts = load_event_articles(spark, sf_dir)
        eng = Wikisearch.ingest(arts, config, EVENT_SCALAR_FIELDS, unique_ids=True)
        eng.index.persist(
            _serving_width(f"{sf_dir}/events.parquet", spark),
            current_partitions=arts.rdd.getNumPartitions(),
        )
        _ENGINES[key] = eng
    return eng
