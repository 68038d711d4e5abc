"""LSM-style catalog maintenance: delta flushes, scan-time merge, compaction.

The reference maintains its index tables with Accumulo's LSM machinery:
in-memory writes flush to small sorted RFiles (minor compaction), scans
merge-read every file applying the attached combiners, and a *major
compaction* periodically rewrites all files of a tablet into one, folding
combiner state for good (combiner scopes attached at
``WikipediaIngester.java:98-135``; the README baselines a full compaction of
the loaded corpus at ~35 min, ``README.md:94-99``).

This module is the Spark analogue over the parquet catalog written by
``operators/ingest.py:write_index``:

- :func:`write_delta` — flush one ingest micro-batch as a small *delta*
  directory beside the base tables (the minor-compaction flush). O(batch)
  work: no rewrite of the base.
- :func:`load_index_with_deltas` — the scan-time merge-read: base ∪ deltas
  with the combiner algebra applied on the fly (sum counts / union uids /
  degrade past ``uid_max`` for the global and reverse indexes —
  ``GlobalIndexUidCombiner.java:66-75``; sum tf / merge-sort offsets for the
  term index — ``TextIndexCombiner.java:40-106``). Queries run unchanged
  against the returned catalog and see every flushed batch.
- :func:`compact_index` — the major compaction: fold base + all deltas,
  rewrite the base tables in their sorted, partition-pruned layout, drop the
  delta directories. After it, scans pay zero merge overhead again.

Scale posture (100 TB): each micro-batch writes only its own data; the
scan-time fold shuffles only on the aggregated tables' group keys (the
append-only tables are a plain union — no shuffle); compaction is the one
full rewrite, scheduled off-peak exactly like the reference's major
compactions. Filesystem operations go through the Hadoop FileSystem API, so
the same code runs on HDFS/S3 on a real cluster and on local disk in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.ingest import (
    WikisearchIndex,
    load_index,
    write_index,
)
from accumulo_wikisearch_spark.streaming.incremental import merge_global_index

TI_KEYS = ["partition_id", "language", "doc_id", "norm_value"]

# tables folded with combiner algebra vs. plain append at merge time
_AGG_TABLES = ("global_index", "reverse_index", "metadata", "term_index")
_APPEND_TABLES = ("doc_fields", "field_index", "docs_wide", "documents")
_ALL_TABLES = _APPEND_TABLES + _AGG_TABLES


def merge_term_index(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold term-index deltas: sum normalized term frequency and merge the
    word-offset lists sorted — the TextIndexCombiner algebra
    (``TextIndexCombiner.java:40-106``: offsets concat-sorted, tf summed).
    Associative and commutative, so scan-time and compaction-time folds
    commute with any flush order."""
    return (
        old.unionByName(delta)
        .groupBy(*TI_KEYS)
        .agg(
            F.sum("occurrences").alias("occurrences"),
            F.sum("tf").alias("tf"),
            F.sort_array(F.flatten(F.collect_list("offsets"))).alias("offsets"),
            # re-ingest of the same doc appends content (multimap semantics):
            # the doc's token count grows with it
            F.sum("doc_len").alias("doc_len"),
        )
    )


def merge_metadata(old: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold metadata: indexed-ness is sticky, freq is a SummingCombiner
    (``WikipediaIngester.java:129-136``)."""
    return (
        old.unionByName(delta)
        .groupBy("field", "language")
        .agg(
            F.max("indexed").alias("indexed"),
            F.first("normalizer").alias("normalizer"),
            F.sum("freq").alias("freq"),
        )
    )


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def delta_batches(spark: SparkSession, path: str) -> list[str]:
    """List flushed delta batch directories under ``{path}/deltas``."""
    fs, hpath, _ = _fs(spark, f"{path}/deltas")
    if not fs.exists(hpath):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(hpath) if st.isDirectory()
    )


def write_delta(delta: WikisearchIndex, path: str, batch_id: int | str) -> None:
    """Flush one ingest batch as ``{path}/deltas/{batch_id}/{table}``.

    The minor-compaction flush: small files, no repartition (the batch is
    micro-batch-sized), no rewrite of the base. ``build_index`` on the new
    articles produces the delta catalog."""
    base = f"{path}/deltas/{batch_id}"
    for name in _ALL_TABLES:
        getattr(delta, name).write.mode("overwrite").parquet(f"{base}/{name}")


def load_index_with_deltas(
    spark: SparkSession, path: str, config: EngineConfig | None = None
) -> WikisearchIndex:
    """Merge-read: base catalog folded with every flushed delta.

    Append-only tables union (duplicate doc ids behave as the reference's
    multimap — one more value per field); aggregated tables re-run their
    combiner fold so e.g. a posting that crossed ``uid_max`` across batches
    correctly degrades to count-only."""
    config = config or EngineConfig()
    index = load_index(spark, path, config)
    batches = delta_batches(spark, path)
    if not batches:
        return index
    rd = spark.read.parquet

    def stacked(name: str) -> DataFrame:
        return rd(*[f"{path}/deltas/{b}/{name}" for b in batches])

    return WikisearchIndex(
        config=config,
        doc_fields=index.doc_fields.unionByName(stacked("doc_fields")),
        field_index=index.field_index.unionByName(stacked("field_index")),
        global_index=merge_global_index(
            index.global_index, stacked("global_index"), config.uid_max
        ),
        reverse_index=merge_global_index(
            index.reverse_index, stacked("reverse_index"), config.uid_max
        ),
        metadata=merge_metadata(index.metadata, stacked("metadata")),
        term_index=merge_term_index(index.term_index, stacked("term_index")),
        docs_wide=index.docs_wide.unionByName(stacked("docs_wide")),
        documents=index.documents.unionByName(stacked("documents")),
    )


def compact_index(
    spark: SparkSession, path: str, config: EngineConfig | None = None
) -> dict[str, int]:
    """Major compaction: fold base + deltas, rewrite the sorted base layout,
    drop the delta directories. Returns ``{n_deltas, files_before,
    files_after}`` (part-file counts for the field_index table).

    The merged tables are materialized (cache + full count) *before* the
    overwrite because their lineage reads the very files being replaced —
    the same reason Accumulo compacts to a tmp file then swaps."""
    config = config or EngineConfig()
    batches = delta_batches(spark, path)
    merged = load_index_with_deltas(spark, path, config)
    files_before = _count_files(spark, path) + _count_files(spark, f"{path}/deltas")

    for name in _ALL_TABLES:
        df = getattr(merged, name).persist()
        df.count()
        setattr(merged, name, df)
    write_index(merged, path)
    for name in _ALL_TABLES:
        getattr(merged, name).unpersist()

    fs, dpath, _ = _fs(spark, f"{path}/deltas")
    if fs.exists(dpath):
        fs.delete(dpath, True)
    return {
        "n_deltas": len(batches),
        "files_before": files_before,
        "files_after": _count_files(spark, path),
    }


def _count_files(spark: SparkSession, path: str) -> int:
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return 0
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().startswith("part-"):
            n += 1
    return n


def catalog_stats(spark: SparkSession, path: str) -> list[dict]:
    """Per-table stats of a written catalog: rows, on-disk bytes, part files.

    The reference README records exactly this (wiki 47.3 GB, wikiIndex
    5.1 GB, wikiReverseIndex 5.5 GB — a ≈6:1 size increase over the input,
    ``README.md:112-120``); this is our measured analogue for capacity
    planning, plus the small-file count that tells you when to compact."""
    out = []
    for name in _ALL_TABLES:
        tpath = f"{path}/{name}"
        fs, hpath, _ = _fs(spark, tpath)
        if not fs.exists(hpath):
            continue
        out.append(
            {
                "table": name,
                "n_rows": spark.read.parquet(tpath).count(),
                "bytes": fs.getContentSummary(hpath).getLength(),
                "files": _count_files(spark, tpath),
            }
        )
    return out


def stream_ingest_deltas(
    stream_articles: DataFrame,
    index_path: str,
    config: EngineConfig,
    scalar_fields: dict[str, str],
    text_col: str = "text",
    checkpoint: str | None = None,
):
    """Continuous ingest, LSM-style: each micro-batch flushes a delta
    (O(batch) work) instead of rewriting the whole catalog; readers use
    :func:`load_index_with_deltas`; :func:`compact_index` runs periodically.

    This is the 100 TB shape of ``streaming/incremental.py:stream_ingest``
    (which rewrites the full index per batch — fine for small catalogs,
    quadratic over a day of micro-batches at scale)."""
    from accumulo_wikisearch_spark.operators.ingest import build_index

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = build_index(batch_df, config, scalar_fields, text_col)
        write_delta(delta, index_path, batch_id)

    writer = stream_articles.writeStream.foreachBatch(process_batch).outputMode(
        "update"
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
