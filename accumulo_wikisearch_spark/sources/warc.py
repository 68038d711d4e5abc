"""WARC (Web ARChive, ISO 28500) record reader — the container format of
Common Crawl, the largest public LLM pretraining source.

Reference parity: extends the ingest-source surface (the reference reads
only Wikipedia XML — `ingest/.../WikipediaMapper.java`) the same way
`sources/xml.py` and `sources/jsonl.py` do, into the corpus-agnostic
``articles`` contract.

Format (plaintext): records of
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``.
Common Crawl ships files as CONCATENATED per-record gzip members;
``gzip.decompress`` inflates all members, so .warc.gz parses unchanged.

Scale shape: one file = one task (binaryFile source; CC files are ~1 GB —
the decompressed file must fit a task's memory, which is the standard WARC
processing model). Record splitting is an Arrow-batched ``mapInPandas``
kernel — there is no Catalyst expression for a byte-offset record walk,
the same justification as the multimodal codecs. A malformed/truncated
record ends that FILE's parse with the records read so far — one bad file
never fails a 100 TB job (same contract as multimodal._split_ppm_stream).
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import hash60_col

RECORD_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_length long, payload binary"
)

_CRLF2 = b"\r\n\r\n"


def _split_warc(b: bytes) -> list[dict]:
    """Split one (decompressed) WARC stream into record dicts."""
    records: list[dict] = []
    pos = 0
    n = len(b)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and b[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not b[pos : pos + 5] == b"WARC/":
            break
        hdr_end = b.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        try:
            headers: dict[str, str] = {}
            for line in b[pos:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                    "utf-8", "replace"
                )
            length = int(headers["content-length"])
        except (KeyError, ValueError, UnicodeDecodeError):
            break
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            break
        records.append(
            {
                "record_id": headers.get("warc-record-id", ""),
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "content_length": length,
                "payload": b[body_start:body_end],
            }
        )
        pos = body_end
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (plaintext or .gz) → one row per record:
    (path, record_id, warc_type, target_uri, warc_date, content_length,
    payload)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "path",
                    "record_id",
                    "warc_type",
                    "target_uri",
                    "warc_date",
                    "content_length",
                    "payload",
                )
            }
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if blob[:2] == b"\x1f\x8b":
                    try:
                        # inflates ALL concatenated members (CC layout)
                        blob = gzip.decompress(blob)
                    except OSError:
                        continue
                for rec in _split_warc(blob):
                    out["path"].append(p)
                    for k, v in rec.items():
                        out[k].append(v)
            yield pd.DataFrame(out)

    return files.mapInPandas(parse, RECORD_SCHEMA)


def build_warc_record(
    record_id: str, warc_type: str, target_uri: str, payload: bytes
) -> bytes:
    """One plaintext WARC/1.0 record (the writer half of the reader above;
    used by the round-trip check and available for corpus export)."""
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return hdr + b"\r\n" + payload + b"\r\n\r\n"


# ---------------------------------------------------------------------------
# driver registry: documents → WARC bytes → parse-back equality against the
# original table (bounded fixture: first 100 docs, built driver-side)
# ---------------------------------------------------------------------------


def _roundtrip_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from accumulo_wikisearch_spark.session import tune_runtime

    tune_runtime(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.where(F.col("doc_id") < 100).select("doc_id", "text").collect()
    blob = b"".join(
        build_warc_record(
            f"<urn:doc:{r['doc_id']}>",
            "conversion",
            f"doc://{r['doc_id']}",
            (r["text"] or "").encode("utf-8"),
        )
        for r in sorted(rows, key=lambda r: r["doc_id"])
    )
    out = tempfile.mkdtemp(prefix="wikisearch-warc-")
    with open(os.path.join(out, "docs.warc"), "wb") as f:
        f.write(blob)
    recs = read_warc(spark, out)
    return recs.select(
        F.regexp_extract(F.col("target_uri"), r"doc://(\d+)", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def queries():
    return {"src_warc_roundtrip": _roundtrip_entry}


def oracle_sql():
    return {
        "src_warc_roundtrip": (
            "SELECT doc_id, text FROM documents WHERE doc_id < 100"
        )
    }


def load_articles_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC response/conversion records → the engine's ``articles``
    contract: id = portable hash of the record id (stable across runs),
    language = 'default' (run lang-ID downstream — textstats.lang_id),
    text = payload decoded as UTF-8 with replacement."""
    recs = read_warc(spark, path).where(
        F.col("warc_type").isin("response", "conversion")
    )
    return recs.select(
        hash60_col(F.col("record_id")).alias("id"),
        F.lit("default").alias("language"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
        F.col("target_uri").alias("source"),
        F.col("content_length").alias("n_chars"),
    )
