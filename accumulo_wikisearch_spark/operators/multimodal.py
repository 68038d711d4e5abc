"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct; decode/resize/frame-sample run as Arrow-batched Python
(``mapInPandas``) because media codecs live in Python/C libraries, while
everything around them (filtering, joins, dedup by content hash) stays
JVM-side on the metadata columns.

The container has no media libraries, so the *decode kernels are stubs*
(clearly marked, deterministic) — the Spark plumbing (schema, batch
iteration, partition-size control) is real and tested:

- ``attach_payload``: makes a (doc_id, payload BINARY, meta STRUCT) frame.
- ``payload_stats``: mapInPandas over binary payloads → per-item stats
  (the shape of a real decode: bytes in, features out).
- ``decode_image`` / ``extract_audio_features``: NotImplementedError stubs
  wired with correct signatures + a ``fake=True`` deterministic path used
  by tests to exercise batching.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = "doc_id long, payload binary, kind string, n_bytes long"
STATS_SCHEMA = "doc_id long, n_bytes int, sha_prefix string"
IMAGE_FEAT_SCHEMA = "doc_id long, width int, height int, channels int"


def attach_payload(docs: DataFrame, kind: str = "blob") -> DataFrame:
    """Wrap a text corpus as binary payloads + metadata — stand-in for real
    media ingestion; at scale the payload column lives in its own parquet
    files (large row groups), like the reference's `d` locality group
    (WikipediaIngester.java:102-105)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit(kind).alias("kind"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched pass over binary payloads: byte length + content hash
    prefix. The real-decode shape: bytes → features, no shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha_prefix": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()[:12]
                    ),
                }
            )
            yield out

    return media.mapInPandas(stats, STATS_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode → (width, height, channels).

    STUB: no imaging library in this container. ``fake=True`` derives
    deterministic pseudo-dimensions from the payload hash so the plumbing
    (batching, schema, downstream joins) is exercised end-to-end.
    """

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = pdf["payload"].map(
                lambda b: int(hashlib.sha256(bytes(b)).hexdigest()[:8], 16)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (h % 1920 + 1).astype("int32"),
                    "height": (h // 1920 % 1080 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    if fake:
        return media.mapInPandas(fake_decode, IMAGE_FEAT_SCHEMA)
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/cv2) not present in "
        "this container; wire the real kernel into the same mapInPandas shape"
    )


def extract_audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature extraction stub — same contract as decode_image."""
    if fake:
        return payload_stats(media).select(
            "doc_id",
            (F.col("n_bytes") / 16000).alias("approx_seconds"),
        )
    raise NotImplementedError(
        "audio decode requires an audio library (soundfile/librosa) not "
        "present in this container"
    )


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def resize_image(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Image resize stub — bytes in, (smaller) bytes out, 1:1 rows.

    The real kernel is a per-row PIL/cv2 call inside the same mapInPandas;
    the fake path truncates the payload deterministically so batch shapes
    and downstream schema are exercised. No shuffle either way."""

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height // 64  # stand-in compression factor
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"].map(lambda b: bytes(b)[:target]),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    if fake:
        return media.mapInPandas(fake_resize, RESIZED_SCHEMA)
    raise NotImplementedError(
        "image resize requires an imaging library (PIL/cv2) not present in "
        "this container; wire the real kernel into the same mapInPandas shape"
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Video frame sampling stub — 1:N row expansion (one row per sampled
    frame), the shape that matters for partition sizing: output rows ∝
    payload size, so at scale the input should be repartitioned by size
    before this pass to avoid straggler partitions.

    Fake path slices the payload every ``every_n_bytes`` as stand-in
    "frames"; a real kernel seeks keyframes with pyav/ffmpeg."""

    def fake_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    if fake:
        return media.mapInPandas(fake_sample, FRAME_SCHEMA)
    raise NotImplementedError(
        "frame sampling requires a video library (pyav/ffmpeg) not present "
        "in this container; wire the real kernel into the same mapInPandas shape"
    )


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def queries():
    from accumulo_wikisearch_spark.session import tune_runtime

    def _mm_stats(spark, sf_dir):
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return payload_stats(attach_payload(docs)).select(
            "doc_id", "n_bytes"
        )

    return {"mm_payload_stats": _mm_stats}


def oracle_sql():
    # UTF-8 text → octet length equals byte length of the payload
    return {
        "mm_payload_stats": (
            "SELECT doc_id, octet_length(encode(text))::INTEGER AS n_bytes FROM documents"
        )
    }
