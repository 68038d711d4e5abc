"""Real-codec multimodal smoke tests (r9 VERDICT ask #5): the
``fake=False`` kernels — BMP/PPM header parse and pixel decode, PPM
frame-stream demux, RIFF/WAVE features — run against REAL payloads here,
so the non-fake branches are no longer CI-dead. The stdlib-codec tests
run everywhere; the PIL / ffmpeg cross-validation tests skip cleanly
where those tools are absent and pin byte-level interop where present."""

import io
import shutil
import struct
import subprocess
import wave

import numpy as np
import pytest

from accumulo_wikisearch_spark.operators import multimodal
from accumulo_wikisearch_spark.operators.multimodal import (
    _decode_pixels,
    _encode_pixels,
)

MEDIA_SCHEMA = "doc_id long, payload binary"


def _gradient(h, w):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[..., 0] = (np.arange(w) * 255 // max(w - 1, 1))[None, :]
    px[..., 1] = (np.arange(h) * 255 // max(h - 1, 1))[:, None]
    px[..., 2] = 7
    return px


def _wav_bytes(rate=8000, nch=1, n=1600, amp=1000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        t = np.arange(n * nch)
        w.writeframes(
            (amp * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2").tobytes()
        )
    return buf.getvalue()


def test_decode_image_real_bmp_ppm_and_undecodable(spark):
    bmp = _encode_pixels(_gradient(12, 9), "bmp")
    ppm = _encode_pixels(_gradient(5, 17), "ppm")
    media = spark.createDataFrame(
        [(1, bmp), (2, ppm), (3, b"\x89PNG\r\n\x1a\nnot-a-real-png")],
        MEDIA_SCHEMA,
    )
    got = {r["doc_id"]: r for r in multimodal.decode_image(media).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (9, 12, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (17, 5, 3)
    # codec formats this container can't honestly decode: nulls, no crash
    assert got[3]["width"] is None and got[3]["channels"] is None


def test_resize_image_real_roundtrip_both_formats(spark):
    src = _gradient(16, 16)
    media = spark.createDataFrame(
        [(1, _encode_pixels(src, "bmp")), (2, _encode_pixels(src, "ppm")), (3, b"junk")],
        MEDIA_SCHEMA,
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.resize_image(media, width=4, height=4).collect()
    }
    for doc, fmt in ((1, "bmp"), (2, "ppm")):
        px, f = _decode_pixels(bytes(got[doc]["payload"]))
        assert f == fmt and px.shape == (4, 4, 3)
        # nearest-neighbor of a gradient keeps corner values exactly
        assert px[0, 0, 2] == 7 and px[0, 0, 0] == src[0, 0, 0]
    assert got[3]["payload"] is None  # undecodable → null payload, no crash


def test_sample_frames_real_ppm_stream(spark):
    frames = [_gradient(4, 6) + i for i in range(5)]
    stream = b"".join(_encode_pixels(f.astype(np.uint8), "ppm") for f in frames)
    media = spark.createDataFrame([(9, stream), (10, b"mp4?")], MEDIA_SCHEMA)
    got = multimodal.sample_frames(media, every_n_frames=2, max_frames=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # frames 0, 2, 4 sampled; each re-decodes standalone with frame 0's px+i
    assert sorted(r["frame_idx"] for r in by_doc[9]) == [0, 1, 2]
    for r in by_doc[9]:
        px, fmt = _decode_pixels(bytes(r["frame"]))
        assert fmt == "ppm" and px.shape == (4, 6, 3)
        assert px[0, 0, 2] == 7 + 2 * r["frame_idx"]
    assert 10 not in by_doc  # codec container → zero rows, no crash


def test_extract_audio_features_real_wav(spark):
    wav = _wav_bytes(rate=8000, nch=1, n=1600, amp=1000)
    media = spark.createDataFrame([(1, wav), (2, b"OggS...")], MEDIA_SCHEMA)
    got = {
        r["doc_id"]: r
        for r in multimodal.extract_audio_features(media).collect()
    }
    r = got[1]
    assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, 1, 1600)
    assert r["duration_ms"] == 200
    # RMS of a 1000-amplitude sine ≈ 1000/sqrt(2) ≈ 707
    assert 690 <= r["rms"] <= 720
    assert got[2]["sample_rate"] is None  # compressed codec → nulls


def test_real_codecs_interop_with_pil(spark):
    """Cross-validate the stdlib BMP/PPM codecs against a REAL image
    library where one exists: PIL must decode our encodes pixel-exactly,
    and our kernels must decode PIL's encodes — the interop that makes
    'real kernel' an honest claim (skips cleanly when PIL is absent)."""
    Image = pytest.importorskip("PIL.Image")

    src = _gradient(10, 7)
    for fmt, pil_fmt in (("bmp", "BMP"), ("ppm", "PPM")):
        ours = _encode_pixels(src, fmt)
        via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
        assert np.array_equal(via_pil, src), f"PIL disagrees on our {fmt}"
        buf = io.BytesIO()
        Image.fromarray(src, "RGB").save(buf, format=pil_fmt)
        dec = _decode_pixels(buf.getvalue())
        assert dec is not None and np.array_equal(dec[0], src), (
            f"our decoder disagrees on PIL's {fmt}"
        )
    # end-to-end through the Spark kernel on a PIL-authored payload
    buf = io.BytesIO()
    Image.fromarray(src, "RGB").save(buf, format="BMP")
    media = spark.createDataFrame([(1, buf.getvalue())], MEDIA_SCHEMA)
    row = multimodal.decode_image(media).collect()[0]
    assert (row["width"], row["height"]) == (7, 10)


def test_sample_frames_on_ffmpeg_authored_stream(spark):
    """Feed a genuinely ffmpeg-authored image2pipe PPM stream through
    sample_frames — the exact producer the real kernel documents (skips
    cleanly when ffmpeg is absent)."""
    if shutil.which("ffmpeg") is None:
        pytest.skip("ffmpeg not installed")
    out = subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=duration=0.2:size=32x24:rate=25",
            "-f", "image2pipe", "-vcodec", "ppm", "-",
        ],
        capture_output=True,
        check=True,
    ).stdout
    media = spark.createDataFrame([(1, out)], MEDIA_SCHEMA)
    rows = multimodal.sample_frames(media, every_n_frames=1, max_frames=3).collect()
    assert len(rows) == 3
    px, fmt = _decode_pixels(bytes(rows[0]["frame"]))
    assert fmt == "ppm" and px.shape == (24, 32, 3)
