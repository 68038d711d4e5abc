"""JSONL corpus adapter — the de-facto interchange format of LLM training
corpora (one JSON document per line).

Reference parity: the reference's only ingest format is Wikipedia XML
(`ingest/.../ingest/WikipediaMapper.java`, `ArticleExtractor.java`); this
module extends the source surface the same way `sources/xml.py` does, into
the engine's corpus-agnostic ``articles`` contract (sources/corpus.py).

Scale posture:
- The schema is EXPLICIT — schema inference on JSON is a full extra pass
  over the data (at 100 TB, a second 100 TB scan before the first real job).
- PERMISSIVE mode with a corrupt-record column: a malformed line becomes a
  quarantined row, never a failed 100 TB job. `corrupt_record_stats` is the
  monitoring hook.
- JSON parsing is JVM-side (Jackson) line-at-a-time — splittable files,
  ordinary Spark parallelism; no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """Read a JSONL documents corpus with the explicit schema; malformed
    lines are dropped (see :func:`corrupt_records` to inspect them).
    ``n_chars`` is derived from the text when absent."""
    df = _raw(spark, path, schema)
    good = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return good.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )


def corrupt_records(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """The quarantined raw lines that failed to parse — (line) rows.

    Diagnostic helper: Spark disallows referencing ONLY the corrupt-record
    column of a raw JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN), so this caches the parsed frame first — point it at a
    bounded sample of the corpus, not all 100 TB."""
    df = _raw(spark, path, schema).cache()
    return df.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("line")
    )


def corrupt_record_stats(
    spark: SparkSession, path: str, schema: str = DOCS_SCHEMA
) -> DataFrame:
    """(n_good, n_corrupt) — the ingest-quality monitoring signal (same
    cache note as :func:`corrupt_records`)."""
    df = _raw(spark, path, schema).cache()
    return df.agg(
        F.count(F.when(F.col(_CORRUPT).isNull(), 1)).cast("long").alias("n_good"),
        F.count(F.col(_CORRUPT)).cast("long").alias("n_corrupt"),
    )


def _raw(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(f"{schema}, {_CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def load_articles_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus → the engine's ``articles`` contract (same mapping as
    sources/corpus.py:load_articles)."""
    docs = read_documents_jsonl(spark, path)
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("lang").alias("language"),
        "text",
        "source",
        "n_chars",
    )


# ---------------------------------------------------------------------------
# driver registry: parquet → JSONL → parquet-equality round-trip, proving
# the adapter preserves the corpus exactly (the driver's oracle compares
# against the original parquet table)
# ---------------------------------------------------------------------------


def _roundtrip_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    out = tempfile.mkdtemp(prefix="wikisearch-jsonl-")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).json(out)
    return read_documents_jsonl(spark, out).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def queries():
    return {"src_jsonl_roundtrip": _roundtrip_entry}


def oracle_sql():
    return {
        "src_jsonl_roundtrip": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        )
    }
