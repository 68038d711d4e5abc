"""Wikipedia-XML ingest front-end (reference operators S1/S2).

The reference splits a raw XML byte stream into ``<page>…</page>`` chunks
across HDFS split boundaries (``AggregatingRecordReader.java:34-177``) and
StAX-parses each chunk into an Article (``ArticleExtractor.java:134-206``),
deriving the language from the dump filename (``WikipediaMapper.java:66,96-102``).

Spark-first version:
- Splitting is ``spark.read.text`` + a ``mapInPandas`` chunker that carries
  partial-page state *within* a partition. Cross-boundary pages are handled
  the way Spark's own text sources do: each input file is one logical stream
  (wholetext per partition), so no page is ever split — the reference's
  start/end-token aggregation exists only because MapReduce fixes split
  boundaries mid-file. At 100 TB the dump is many files; per-file streaming
  keeps memory bounded to one page at a time.
- Parsing is Python ``xml.etree`` inside the same Arrow batch — vectorized
  transfer, per-batch pure compute, no shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_RE = re.compile(r"<page>.*?</page>", re.DOTALL)

ARTICLE_SCHEMA = (
    "id long, title string, timestamp string, comments string, text string, language string"
)


def extract_pages(blob: str) -> list[str]:
    """Chunk a dump blob into <page> XML fragments (S1)."""
    return PAGE_RE.findall(blob)


def parse_page(fragment: str, language: str) -> dict[str, Any] | None:
    """One <page> fragment → Article dict (S2; ArticleExtractor fields:
    id, title, timestamp, comments, text — ArticleExtractor.java:43-123)."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(fragment)
    except ET.ParseError:
        return None
    rev = root.find("revision")
    if rev is None:
        return None

    def txt(el, tag):
        t = el.find(tag)
        return t.text if t is not None and t.text else ""

    try:
        pid = int(txt(root, "id"))
    except ValueError:
        return None
    return {
        "id": pid,
        "title": txt(root, "title"),
        "timestamp": txt(rev, "timestamp"),
        "comments": txt(rev, "comment"),
        "text": txt(rev, "text"),
        "language": language,
    }


_LANG_RE = re.compile(r"([a-z_]+)wiki")


def language_from_filename(name: str) -> str:
    """dump filename → language label (WikipediaMapper.java:66,96-102)."""
    m = _LANG_RE.search(name)
    return (m.group(1) + "wiki") if m else "unknown"


def read_wikipedia_xml(spark: SparkSession, path: str) -> DataFrame:
    """Dump files → articles DataFrame, streaming pages per Arrow batch."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("file"), F.col("value")
    )

    def chunk_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for file, blob in zip(pdf["file"], pdf["value"]):
                lang = language_from_filename(file)
                for frag in extract_pages(blob):
                    art = parse_page(frag, lang)
                    if art is not None:
                        rows.append(art)
            yield pd.DataFrame(
                rows,
                columns=["id", "title", "timestamp", "comments", "text", "language"],
            )

    return raw.mapInPandas(chunk_parse, ARTICLE_SCHEMA)


def write_wikipedia_xml(pages: DataFrame, path: str) -> None:
    """The writer half of the reader above: (id, title, timestamp, comment,
    text) rows → ``<page>`` fragments in text files under ``path`` — one
    file per partition, a distributed write (no driver materialization).
    Name the target directory after the dump (e.g. ``…/enwiki``) so
    :func:`language_from_filename` labels the read-back. Content fields
    are escaped entirely JVM-side: &, <, > as entities; carriage returns
    as ``&#13;`` (a raw CR would be silently normalized to LF by every
    conforming XML parser, corrupting the round trip); and the control
    characters XML 1.0 CANNOT represent (0x00-0x08, 0x0B, 0x0C,
    0x0E-0x1F) as U+FFFD — an explicit, visible substitution instead of
    the whole page silently failing to parse on read-back."""

    def esc(c: Column) -> Column:
        c = F.replace(c, F.lit("&"), F.lit("&amp;"))
        c = F.replace(c, F.lit("<"), F.lit("&lt;"))
        c = F.replace(c, F.lit(">"), F.lit("&gt;"))
        c = F.replace(c, F.lit("\r"), F.lit("&#13;"))
        return F.regexp_replace(
            c, "[\x00-\x08\x0b\x0c\x0e-\x1f]", "�"
        )

    frag = F.concat(
        F.lit("<page><id>"),
        F.col("id").cast("string"),
        F.lit("</id><title>"),
        esc(F.col("title")),
        F.lit("</title><revision><timestamp>"),
        # escaped like every other content field: a timestamp containing
        # &, < or control chars would otherwise emit an unparseable <page>
        # that parse_page silently DROPS on read-back (id is safe unescaped
        # only because it is cast from a numeric column)
        esc(F.col("timestamp")),
        F.lit("</timestamp><comment>"),
        esc(F.col("comment")),
        F.lit("</comment><text>"),
        esc(F.col("text")),
        F.lit("</text></revision></page>"),
    )
    pages.select(frag.alias("value")).write.mode("overwrite").text(path)


# ---------------------------------------------------------------------------
# driver registry: parquet → wiki-XML pages → read_wikipedia_xml → equality
# against the original table — the same round-trip pattern as jsonl/warc/csv,
# for the reference's CANONICAL ingest format (AggregatingRecordReader.java
# chunking + ArticleExtractor.java field extraction).
# ---------------------------------------------------------------------------


def _roundtrip_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    out = os.path.join(tempfile.mkdtemp(prefix="xmlsrc-"), "enwiki")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        F.col("doc_id").alias("id"),
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias("title"),
        F.lit("2024-01-01T00:00:00Z").alias("timestamp"),
        F.lit("").alias("comment"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    write_wikipedia_xml(pages, out)
    arts = read_wikipedia_xml(spark, out)
    return arts.select(
        F.col("id").alias("doc_id"), "title", "text", "language"
    )


def queries():
    return {"src_xml_roundtrip": _roundtrip_entry}


def oracle_sql():
    return {
        "src_xml_roundtrip": (
            "SELECT doc_id, 'doc ' || doc_id::VARCHAR AS title, "
            "coalesce(text, '') AS text, 'enwiki' AS language FROM documents"
        )
    }
