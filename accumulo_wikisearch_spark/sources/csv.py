"""CSV/TSV corpus adapter — the remaining structured-text interchange
format next to JSONL (sources/jsonl.py); same explicit-schema +
corrupt-line-quarantine contract.

Scale posture mirrors JSONL: explicit schema (inference is a second full
pass), PERMISSIVE mode (a malformed line is a quarantined row, not a
failed 100 TB job), JVM-side Univocity parsing. Quoting/escaping is
handled by the writer/reader pair (embedded commas, quotes); embedded
NEWLINES require ``multiLine=True``, which makes files unsplittable — at
scale prefer newline-free text columns (or JSONL) over multiLine CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.sources.jsonl import DOCS_SCHEMA

_CORRUPT = "_corrupt_record"


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_SCHEMA,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """Read a CSV documents corpus with the explicit schema; malformed
    lines are dropped; ``n_chars`` derived from the text when absent."""
    df = _raw(spark, path, schema, sep, header)
    good = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return good.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )


def corrupt_record_stats_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_SCHEMA,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """(n_good, n_corrupt) — cached first (same Spark restriction as
    jsonl.corrupt_record_stats; run on a bounded sample at scale)."""
    df = _raw(spark, path, schema, sep, header).cache()
    return df.agg(
        F.count(F.when(F.col(_CORRUPT).isNull(), 1)).cast("long").alias("n_good"),
        F.count(F.col(_CORRUPT)).cast("long").alias("n_corrupt"),
    )


def _raw(
    spark: SparkSession, path: str, schema: str, sep: str, header: bool
) -> DataFrame:
    return (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("enforceSchema", "false")
        .csv(path)
    )


def load_articles_csv(
    spark: SparkSession, path: str, sep: str = ","
) -> DataFrame:
    """CSV corpus → the engine's ``articles`` contract."""
    docs = read_documents_csv(spark, path, sep=sep)
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("language"),
        "text",
        "source",
        "n_chars",
    )


# ---------------------------------------------------------------------------
# driver registry: parquet → CSV → parquet-equality round-trip
# ---------------------------------------------------------------------------


def _roundtrip_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    out = tempfile.mkdtemp(prefix="wikisearch-csv-")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).option("header", "true").csv(out)
    return read_documents_csv(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def queries():
    return {"src_csv_roundtrip": _roundtrip_entry}


def oracle_sql():
    return {
        "src_csv_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        )
    }
