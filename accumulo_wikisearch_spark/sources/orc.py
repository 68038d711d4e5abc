"""ORC corpus adapter — the second columnar at-rest format beside
parquet (HDFS-ecosystem interchange; Hive/Trino corpora commonly land as
ORC). Native Spark reader: JVM vectorized decode, column pruning and
predicate pushdown exactly like the parquet scans the engine already
pins (`PushedFilters` reaches the ORC scan node — asserted in
tests/test_orc_source.py).

Unlike the text formats (sources/jsonl.py, sources/csv.py) there is no
corrupt-line quarantine contract: ORC is schema-on-file and
checksummed, so a damaged stripe is an IO error to surface, not a row
to quarantine. The round-trip driver entry proves value/schema fidelity
through the writer/reader pair.

Reference analogue: none (the reference ingests XML dumps only); this
is part of the engine's Spark-native source surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC documents corpus; ``n_chars`` derived when absent."""
    df = spark.read.orc(path)
    if "n_chars" not in df.columns:
        df = df.withColumn("n_chars", F.length("text").cast("long"))
    return df


def load_articles_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC corpus → the engine's ``articles`` contract."""
    docs = read_documents_orc(spark, path)
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("language"),
        "text",
        "source",
        "n_chars",
    )


# ---------------------------------------------------------------------------
# driver registry: parquet → ORC → parquet-equality round-trip
# ---------------------------------------------------------------------------


def _roundtrip_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    out = tempfile.mkdtemp(prefix="wikisearch-orc-")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).orc(out)
    return read_documents_orc(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def queries():
    return {"src_orc_roundtrip": _roundtrip_entry}


def oracle_sql():
    return {
        "src_orc_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        )
    }
