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


def load_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("language"),
        "text",
        "source",
        "n_chars",
    )


# Engine cache keyed by (sf_dir, config) so a batch of queries against the
# same scale factor builds the index once (the reference's ingest is likewise
# a one-time batch; queries share the built tables).
_ENGINES: dict[tuple, Wikisearch] = {}


def get_engine(
    spark: SparkSession, sf_dir: str, config: EngineConfig | None = None
) -> Wikisearch:
    config = config or EngineConfig()
    key = (sf_dir, config)
    eng = _ENGINES.get(key)
    if eng is None:
        articles = load_articles(spark, sf_dir)
        eng = Wikisearch.ingest(articles, config, SCALAR_FIELDS)
        eng.index.persist()
        _ENGINES[key] = eng
    return eng
