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

Scale shape: one file = one task (binaryFile source; CC files are ~1 GB).
Decompression is STREAMING (zlib incremental over the concatenated gzip
members) and records are parsed from a rolling buffer, so task memory is
O(compressed file + one record + one chunk) — the decompressed stream is
never materialized. Record splitting is an Arrow-batched ``mapInPandas``
kernel — there is no Catalyst expression for a byte-offset record walk,
the same justification as the multimodal codecs. A malformed/truncated
record (including a negative or backwards-pointing Content-Length) ends
that FILE's parse with the records read so far — one bad file never fails
a 100 TB job (same contract as multimodal._split_ppm_stream).
"""

from __future__ import annotations

import zlib
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import hash60_col

RECORD_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_length long, payload binary"
)

_CRLF2 = b"\r\n\r\n"
_CHUNK = 1 << 20  # compressed-read / decompress granularity
_MAX_HEADER = 1 << 20  # a header block larger than this is malformed
# A Content-Length above this is treated as malformed and ends the file's
# parse. Without the cap, a hostile/corrupt huge length makes the buffer
# loop slurp the entire remaining stream before detecting truncation —
# exactly the unbounded memory the rolling buffer exists to prevent.
# Real Common Crawl records are ≤ ~1 MB; 256 MB is generous headroom.
_MAX_RECORD = 256 << 20


def _gunzip_stream(raw: bytes, chunk: int = _CHUNK) -> Iterator[bytes]:
    """Incrementally inflate CONCATENATED gzip members (the Common Crawl
    per-record-member layout) from an in-memory compressed blob, yielding
    bounded decompressed chunks — state is O(chunk), the full decompressed
    stream never exists at once. A zlib error propagates to the caller,
    which treats it as 'this file ends here'."""
    d = zlib.decompressobj(31)  # 31 = gzip wrapper
    pos, n = 0, len(raw)
    pending = b""
    while pos < n or pending:
        if not pending:
            pending = raw[pos : pos + chunk]
            pos += chunk
        out = d.decompress(pending, chunk)
        if out:
            yield out
        if d.eof:
            # next concatenated member (or trailing garbage, which the
            # fresh decompressobj will reject as a zlib.error). On eof the
            # leftover bytes are in unused_data (unconsumed_tail aliases
            # the same bytes — do NOT concatenate both).
            pending = d.unused_data
            d = zlib.decompressobj(31)
            if not pending and pos >= n:
                return
        else:
            pending = d.unconsumed_tail
    tail = d.flush()
    if tail:
        yield tail


def _records_from_stream(chunks: Iterable[bytes]) -> Iterator[dict]:
    """Parse WARC records from an iterator of byte chunks with a rolling
    buffer: memory is O(one record + one chunk). Any malformed header —
    missing/negative/absurdly-large Content-Length, oversized header
    block, non-WARC leader — ends the stream's parse (records already yielded stand),
    and the buffer cursor strictly advances so no input can loop."""
    buf = bytearray()
    it = iter(chunks)
    eof = False

    def fill() -> bool:
        nonlocal eof
        if eof:
            return False
        nxt = next(it, None)
        if nxt is None:
            eof = True
            return False
        buf.extend(nxt)
        return True

    while True:
        # tolerate inter-record padding
        pad = 0
        while True:
            while pad < len(buf) and buf[pad] in (13, 10):
                pad += 1
            if pad < len(buf) or not fill():
                break
        if pad:
            del buf[:pad]
        while len(buf) < 5 and fill():
            pass
        if not buf[:5] == b"WARC/":
            return
        while (hdr_end := buf.find(_CRLF2)) < 0:
            if len(buf) > _MAX_HEADER or not fill():
                return
        try:
            headers: dict[str, str] = {}
            for line in bytes(buf[:hdr_end]).split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                    "utf-8", "replace"
                )
            length = int(headers["content-length"])
        except (KeyError, ValueError, UnicodeDecodeError):
            return
        if length < 0 or length > _MAX_RECORD:
            return  # backwards-pointing or absurd body length: malformed
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + length
        while len(buf) < body_end and fill():
            pass
        if len(buf) < body_end:
            return  # truncated record
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_length": length,
            "payload": bytes(buf[body_start:body_end]),
        }
        del buf[:body_end]  # strictly advances (body_end ≥ hdr_end+4 > 0)


def _split_warc(b: bytes) -> list[dict]:
    """Split one (decompressed) WARC stream into record dicts."""
    return list(_records_from_stream((b,)))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` (plaintext or .gz) → one row per record:
    (path, record_id, warc_type, target_uri, warc_date, content_length,
    payload)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    cols = (
        "path",
        "record_id",
        "warc_type",
        "target_uri",
        "warc_date",
        "content_length",
        "payload",
    )

    def parse(batches) -> Iterator["pd.DataFrame"]:
        out: dict[str, list] = {k: [] for k in cols}
        n_out = 0

        def flush():
            nonlocal out, n_out
            df = pd.DataFrame(out)
            out = {k: [] for k in cols}
            n_out = 0
            return df

        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                chunks: Iterable[bytes] = (
                    _gunzip_stream(blob) if blob[:2] == b"\x1f\x8b" else (blob,)
                )
                try:
                    for rec in _records_from_stream(chunks):
                        out["path"].append(p)
                        for k, v in rec.items():
                            out[k].append(v)
                        n_out += 1
                        if n_out >= 256:
                            yield flush()
                except zlib.error:
                    # corrupt compressed tail: keep the records read so far
                    pass
        if n_out:
            yield flush()

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
