"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct; decode/resize/frame-sample run as Arrow-batched Python
(``mapInPandas``) because media codecs live in Python/C libraries, while
everything around them (filtering, joins, dedup by content hash) stays
JVM-side on the metadata columns.

Decode kernels come in two tiers:

- REAL kernels for container-formats the stdlib can parse: BMP / PPM image
  headers (``decode_image``) and RIFF/WAVE audio (``extract_audio_features``
  — stdlib ``wave`` + numpy PCM stats). These run the same Arrow-batched
  ``mapInPandas`` path a PIL/ffmpeg kernel would.
- REAL kernels likewise for resize (numpy nearest-neighbor over decoded
  BMP/PPM pixels) and frame sampling (raw PPM frame streams — ffmpeg's
  codec-free image2pipe container).
- Codec formats (JPEG/PNG/mp4) whose libraries aren't in this container
  yield null features / zero rows — a PIL/cv2/pyav call drops into the
  same per-row slot; every operator also has a ``fake=True`` deterministic
  path so batching/schema/joins are exercisable on arbitrary payloads.

Also here: ``attach_payload`` (text corpus → binary payload + metadata
frame) and ``payload_stats`` (bytes → features, the canonical decode shape).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
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


def _parse_image_header(b: bytes) -> tuple[int | None, int | None, int | None]:
    """Pure-stdlib image header parse: BMP and binary PPM (P6).

    Returns (width, height, channels); (None, None, None) for formats that
    need a codec library (JPEG/PNG/...)."""
    if len(b) >= 30 and b[:2] == b"BM":
        # BITMAPINFOHEADER: int32 width @18, int32 height @22, uint16 bpp @28
        width, height = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        return width, abs(height), max(1, bpp // 8)
    if b[:2] == b"P6":
        try:
            # header tokens: P6 <width> <height> <maxval>, '#' comments allowed
            toks: list[bytes] = []
            for line in b[2:256].split(b"\n"):
                toks.extend(line.split(b"#")[0].split())
                if len(toks) >= 3:
                    break
            return int(toks[0]), int(toks[1]), 3
        except (ValueError, IndexError):
            return None, None, None
    return None, None, None


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode → (width, height, channels).

    REAL kernel for BMP / binary-PPM payloads (pure header parse — no
    library needed); codec formats (JPEG/PNG) decode to nulls here and need
    a PIL/cv2 kernel dropped into the same mapInPandas shape. ``fake=True``
    derives deterministic pseudo-dimensions from the payload hash so
    arbitrary payloads exercise the plumbing end-to-end.
    """

    def real_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_parse_image_header(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([d[0] for d in dims], dtype="Int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="Int32"),
                    "channels": pd.Series([d[2] for d in dims], dtype="Int32"),
                }
            )

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

    return media.mapInPandas(fake_decode if fake else real_decode, IMAGE_FEAT_SCHEMA)


AUDIO_FEAT_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_frames long, "
    "duration_ms long, rms int"
)


def extract_audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Audio features from RIFF/WAVE payloads — REAL kernel (stdlib ``wave``
    + numpy over PCM16): sample rate, channels, frame count, duration, RMS
    amplitude. Non-WAV / compressed payloads yield null features (an
    ffmpeg-backed kernel drops into the same shape). ``fake=True`` keeps the
    old byte-length heuristic for arbitrary payloads."""
    if fake:
        return payload_stats(media).select(
            "doc_id",
            (F.col("n_bytes") / 16000).alias("approx_seconds"),
        )

    def wav_features(b: bytes):
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return (None, None, None, None, None)
        try:
            with wave.open(io.BytesIO(b)) as w:
                rate, nch, nframes = w.getframerate(), w.getnchannels(), w.getnframes()
                width = w.getsampwidth()
                pcm = w.readframes(nframes)
            rms = None
            if width == 2 and pcm:
                x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                rms = int(np.sqrt(np.mean(x * x)))
            return (rate, nch, nframes, nframes * 1000 // rate if rate else None, rms)
        except (wave.Error, EOFError, struct.error):
            return (None, None, None, None, None)

    def real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [wav_features(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": pd.Series([f[0] for f in feats], dtype="Int32"),
                    "n_channels": pd.Series([f[1] for f in feats], dtype="Int32"),
                    "n_frames": pd.Series([f[2] for f in feats], dtype="Int64"),
                    "duration_ms": pd.Series([f[3] for f in feats], dtype="Int64"),
                    "rms": pd.Series([f[4] for f in feats], dtype="Int32"),
                }
            )

    return media.mapInPandas(real, AUDIO_FEAT_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def _decode_pixels(b: bytes) -> tuple[np.ndarray, str] | None:
    """Decode BMP (24-bit uncompressed) or binary-PPM payload to an
    (H, W, 3) uint8 array. None for codec formats (JPEG/PNG/...)."""
    if b[:2] == b"P6":
        try:
            pos, toks = 2, []
            while len(toks) < 3:
                # skip whitespace + '#' comments, collect header tokens
                while pos < len(b) and b[pos : pos + 1].isspace():
                    pos += 1
                if b[pos : pos + 1] == b"#":
                    pos = b.index(b"\n", pos) + 1
                    continue
                end = pos
                while end < len(b) and not b[end : end + 1].isspace():
                    end += 1
                toks.append(b[pos:end])
                pos = end
            pos += 1  # single whitespace after maxval
            w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
            if maxval != 255:
                return None
            px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
            return px.reshape(h, w, 3).copy(), "ppm"
        except (ValueError, IndexError):
            return None
    if len(b) >= 54 and b[:2] == b"BM":
        try:
            off = struct.unpack_from("<I", b, 10)[0]
            w, h = struct.unpack_from("<ii", b, 18)
            bpp = struct.unpack_from("<H", b, 28)[0]
            comp = struct.unpack_from("<I", b, 30)[0]
            if bpp != 24 or comp != 0 or w <= 0:
                return None
            stride = (w * 3 + 3) & ~3
            flip = h > 0
            h = abs(h)
            rows = np.frombuffer(
                b, dtype=np.uint8, count=stride * h, offset=off
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            return (rows[::-1] if flip else rows).copy(), "bmp"
        except (ValueError, struct.error):
            return None
    return None


def _encode_pixels(px: np.ndarray, fmt: str) -> bytes:
    h, w, _ = px.shape
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI" + "IiiHHIIiiII",
        b"BM", 54 + stride * h, 0, 0, 54,
        40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0,
    )
    return header + rows.tobytes()


def resize_image(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Image resize — bytes in, resized bytes out, 1:1 rows, no shuffle.

    REAL kernel (pure numpy nearest-neighbor) for the formats this
    container can honestly decode: 24-bit uncompressed BMP and binary PPM;
    the output re-encodes in the input's format. Codec payloads (JPEG/PNG)
    yield null payloads — a PIL/cv2 call drops into the same per-row slot.
    ``fake=True`` keeps the deterministic truncation stand-in for arbitrary
    payloads."""

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

    def real_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for b in pdf["payload"]:
                dec = _decode_pixels(bytes(b))
                if dec is None:
                    payloads.append(None)
                    continue
                px, fmt = dec
                h0, w0, _ = px.shape
                ri = (np.arange(height) * h0) // height
                ci = (np.arange(width) * w0) // width
                payloads.append(_encode_pixels(px[ri][:, ci], fmt))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return media.mapInPandas(fake_resize if fake else real_resize, RESIZED_SCHEMA)


def _split_ppm_stream(b: bytes) -> list[bytes]:
    """Split a raw PPM frame stream (concatenated P6 images — ffmpeg's
    image2pipe rawvideo-ish container) into standalone frame payloads."""
    frames = []
    pos = 0
    while b[pos : pos + 2] == b"P6":
        toks: list[int] = []
        cur = pos + 2
        try:
            while len(toks) < 3:
                while cur < len(b) and b[cur : cur + 1].isspace():
                    cur += 1
                if b[cur : cur + 1] == b"#":
                    cur = b.index(b"\n", cur) + 1
                    continue
                end = cur
                while end < len(b) and not b[end : end + 1].isspace():
                    end += 1
                toks.append(int(b[cur:end]))
                cur = end
        except (ValueError, IndexError):
            # truncated/malformed header: undecodable payloads yield the
            # frames parsed so far, never a job-failing exception
            break
        cur += 1  # single whitespace after maxval
        w, h, maxval = toks
        if maxval != 255:
            break
        end = cur + w * h * 3
        if end > len(b):
            break
        frames.append(b[pos:end])
        pos = end
    return frames


def sample_frames(
    media: DataFrame,
    every_n_frames: int = 2,
    max_frames: int = 8,
    fake: bool = False,
    every_n_bytes: int = 256,
) -> DataFrame:
    """Video frame sampling — 1:N row expansion (one row per sampled
    frame), the shape that matters for partition sizing: output rows ∝
    payload size, so at scale the input should be repartitioned by size
    before this pass to avoid straggler partitions.

    REAL kernel for raw PPM frame streams (concatenated P6 images — the
    codec-free container ffmpeg's image2pipe emits): every
    ``every_n_frames``-th frame is re-emitted as a standalone PPM payload,
    up to ``max_frames``. Codec containers (mp4/webm) yield zero rows — a
    pyav/ffmpeg demuxer drops into the same per-payload slot. The fake
    path slices the payload every ``every_n_bytes`` as stand-in frames for
    arbitrary payloads."""

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

    def real_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                all_frames = _split_ppm_stream(bytes(payload))
                for i, fr in enumerate(all_frames[:: max(1, every_n_frames)]):
                    if i >= max_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(fake_sample if fake else real_sample, FRAME_SCHEMA)


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

    def _mm_audio(spark, sf_dir):
        # end-to-end WAV round trip: silent PCM16 payloads built row-wise
        # (stdlib wave writer) with rate/length derived from doc fields,
        # parsed back by the real wave+numpy kernel; the oracle predicts
        # every feature (incl. integer duration math, rms=0 for silence)
        # straight from the fields
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars"
        )

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                    rate = 8000 + int(doc_id % 4) * 4000
                    frames = (int(n_chars) % 100 + 1) * 10
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(rate)
                        w.writeframes(b"\x00" * (frames * 2))
                    payloads.append(buf.getvalue())
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        media = docs.mapInPandas(build, "doc_id long, payload binary")
        return extract_audio_features(media)

    def _mm_decode(spark, sf_dir):
        # end-to-end check of the REAL decode kernel: per-doc PPM payloads
        # with dimensions derived from doc fields, parsed back out of the
        # binary by the mapInPandas header parser; the oracle predicts the
        # dims straight from the fields, so a parse bug breaks the match
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        header = F.format_string(
            "P6\n%d %d\n255\n",
            (F.col("n_chars") % 64 + 1).cast("int"),
            (F.col("doc_id") % 32 + 1).cast("int"),
        )
        media = docs.select("doc_id", F.encode(header, "UTF-8").alias("payload"))
        return decode_image(media)

    def _mm_resize(spark, sf_dir):
        # end-to-end check of the REAL resize kernel: per-doc PPM images
        # whose row r is filled with byte (doc_id*7 + r*13) % 256, resized
        # by the numpy nearest-neighbor kernel to 4x3, then decoded BACK
        # out of the re-encoded payload and pixel-summed. The oracle
        # replays the NN row-index math ((i*h0)//3) straight from the doc
        # fields — a wrong stride, flip, or re-encode breaks the hash.
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars"
        )

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                    h0 = int(doc_id) % 5 + 2
                    w0 = int(n_chars) % 5 + 2
                    px = np.empty((h0, w0, 3), dtype=np.uint8)
                    for r in range(h0):
                        px[r] = (int(doc_id) * 7 + r * 13) % 256
                    payloads.append(_encode_pixels(px, "ppm"))
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        media = docs.mapInPandas(build, "doc_id long, payload binary")
        resized = resize_image(media, width=4, height=3)

        def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ws, hs, sums = [], [], []
                for b in pdf["payload"]:
                    dec = _decode_pixels(bytes(b)) if b is not None else None
                    if dec is None:
                        ws.append(None), hs.append(None), sums.append(None)
                        continue
                    px, _ = dec
                    hs.append(px.shape[0]), ws.append(px.shape[1])
                    sums.append(int(px.astype(np.int64).sum()))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": pd.Series(ws, dtype="Int32"),
                        "height": pd.Series(hs, dtype="Int32"),
                        "pix_sum": pd.Series(sums, dtype="Int64"),
                    }
                )

        return resized.mapInPandas(
            stats, "doc_id long, width int, height int, pix_sum long"
        )

    def _mm_frames(spark, sf_dir):
        # end-to-end check of the REAL frame sampler: per-doc raw PPM
        # streams of (doc_id % 6 + 1) 2x2 frames, frame f filled with byte
        # (doc_id + 31*f) % 256; sample every 2nd frame, then decode each
        # sampled frame and pixel-sum it. 1:N row expansion proven against
        # an unnest(range(...)) oracle.
        tune_runtime(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for doc_id in pdf["doc_id"]:
                    k = int(doc_id) % 6 + 1
                    stream = b"".join(
                        b"P6\n2 2\n255\n"
                        + bytes([(int(doc_id) + 31 * f) % 256]) * 12
                        for f in range(k)
                    )
                    payloads.append(stream)
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

        media = docs.mapInPandas(build, "doc_id long, payload binary")
        frames = sample_frames(media, every_n_frames=2, max_frames=8)

        def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                sums = []
                for b in pdf["frame"]:
                    dec = _decode_pixels(bytes(b))
                    sums.append(
                        int(dec[0].astype(np.int64).sum()) if dec else None
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "frame_idx": pdf["frame_idx"],
                        "n_bytes": pdf["frame"].map(len).astype("int32"),
                        "pix_sum": pd.Series(sums, dtype="Int64"),
                    }
                )

        return frames.mapInPandas(
            stats, "doc_id long, frame_idx int, n_bytes int, pix_sum long"
        )

    return {
        "mm_payload_stats": _mm_stats,
        "mm_decode_image": _mm_decode,
        "mm_audio_features": _mm_audio,
        "mm_resize_image": _mm_resize,
        "mm_video_frames": _mm_frames,
    }


def oracle_sql():
    # UTF-8 text → octet length equals byte length of the payload
    return {
        "mm_payload_stats": (
            "SELECT doc_id, octet_length(encode(text))::INTEGER AS n_bytes FROM documents"
        ),
        "mm_decode_image": (
            "SELECT doc_id, (n_chars % 64 + 1)::INTEGER AS width, "
            "(doc_id % 32 + 1)::INTEGER AS height, 3::INTEGER AS channels "
            "FROM documents"
        ),
        "mm_audio_features": """
SELECT doc_id,
  (8000 + (doc_id % 4) * 4000)::INTEGER AS sample_rate,
  1::INTEGER AS n_channels,
  ((n_chars % 100 + 1) * 10)::BIGINT AS n_frames,
  (((n_chars % 100 + 1) * 10) * 1000 // (8000 + (doc_id % 4) * 4000))::BIGINT AS duration_ms,
  0::INTEGER AS rms
FROM documents
""",
        # NN row index for output row i of 3: src = (i * h0) // 3 with
        # h0 = doc_id % 5 + 2; every output row is 4 px * 3 channels of
        # the same byte, so pix_sum = 12 * sum over rows
        "mm_resize_image": """
SELECT doc_id, 4::INTEGER AS width, 3::INTEGER AS height,
  (SELECT sum(((doc_id * 7 + ((u.i * (doc_id % 5 + 2)) // 3) * 13) % 256) * 12)
   FROM unnest(range(0, 3)) AS u(i))::BIGINT AS pix_sum
FROM documents
""",
        # sampled frame j corresponds to source frame 2*j of k = doc_id%6+1
        # frames; each 2x2 frame is 11 header bytes + 12 pixel bytes of
        # value (doc_id + 31*(2*j)) % 256
        "mm_video_frames": """
SELECT doc_id, u.j::INTEGER AS frame_idx, 23::INTEGER AS n_bytes,
  (((doc_id + 62 * u.j) % 256) * 12)::BIGINT AS pix_sum
FROM (SELECT doc_id, (doc_id % 6 + 1) AS k FROM documents) d,
     unnest(range(0, (d.k + 1) // 2)) AS u(j)
""",
    }
