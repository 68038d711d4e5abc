"""XML ingest front-end (S1/S2) and multimodal plumbing tests."""

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.sources.xml import (
    extract_pages,
    language_from_filename,
    parse_page,
    read_wikipedia_xml,
)
from accumulo_wikisearch_spark.operators import multimodal

PAGE = """<page>
  <title>Abacus</title>
  <id>11</id>
  <revision>
    <timestamp>2011-09-01T00:00:00Z</timestamp>
    <comment>initial</comment>
    <text>the abacus is an ancient tool</text>
  </revision>
</page>"""

DUMP = f"""<mediawiki>
{PAGE}
<page><title>Acid</title><id>12</id><revision>
<timestamp>2011-09-02T00:00:00Z</timestamp><comment>c</comment>
<text>acid is corrosive</text></revision></page>
<page><broken</page>
</mediawiki>"""


def test_extract_pages_chunks():
    assert len(extract_pages(DUMP)) == 3  # incl. the broken fragment


def test_parse_page_fields():
    art = parse_page(PAGE, "enwiki")
    assert art == {
        "id": 11,
        "title": "Abacus",
        "timestamp": "2011-09-01T00:00:00Z",
        "comments": "initial",
        "text": "the abacus is an ancient tool",
        "language": "enwiki",
    }


def test_parse_page_bad_xml_returns_none():
    assert parse_page("<page><broken</page>", "enwiki") is None


def test_language_from_filename():
    assert language_from_filename("/data/enwiki-20110901-pages.xml") == "enwiki"
    assert language_from_filename("dewiki.xml") == "dewiki"
    assert language_from_filename("whatever.xml") == "unknown"


def test_read_wikipedia_xml_end_to_end(spark):
    with tempfile.TemporaryDirectory() as tmp:
        Path(f"{tmp}/enwiki-test.xml").write_text(DUMP)
        df = read_wikipedia_xml(spark, tmp)
        rows = {r["id"]: r for r in df.collect()}
        assert set(rows) == {11, 12}
        assert rows[11]["title"] == "Abacus"
        assert rows[11]["language"] == "enwiki"
        # feeds straight into the engine
        from accumulo_wikisearch_spark.api import Wikisearch
        from accumulo_wikisearch_spark.config import EngineConfig

        eng = Wikisearch.ingest(
            df, EngineConfig(num_partitions=2), {"ID": "id", "TITLE": "title"}
        )
        got = [r["doc_id"] for r in eng.query("TEXT == 'abacus'").collect()]
        assert got == [11]


def test_multimodal_payload_stats(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "worlds!")], "doc_id long, text string")
    media = multimodal.attach_payload(docs)
    out = {r["doc_id"]: r for r in multimodal.payload_stats(media).collect()}
    assert out[1]["n_bytes"] == 5 and out[2]["n_bytes"] == 7
    assert len(out[1]["sha_prefix"]) == 12


def test_multimodal_fake_decode_deterministic(spark):
    docs = spark.createDataFrame([(1, "imgdata")], "doc_id long, text string")
    media = multimodal.attach_payload(docs, kind="image")
    a = multimodal.decode_image(media, fake=True).collect()[0]
    b = multimodal.decode_image(media, fake=True).collect()[0]
    assert (a["width"], a["height"], a["channels"]) == (b["width"], b["height"], 3)
    assert 1 <= a["width"] <= 1920


def _media_df(spark, payloads: dict[int, bytes]):
    rows = [(i, bytearray(b), "media", len(b)) for i, b in payloads.items()]
    return spark.createDataFrame(
        rows, "doc_id long, payload binary, kind string, n_bytes long"
    )


def test_multimodal_real_bmp_and_ppm_decode(spark):
    import struct

    # minimal BMP: 'BM' + 16 filler + int32 w, int32 h @18/22, uint16 bpp @28
    bmp = bytearray(40)
    bmp[0:2] = b"BM"
    struct.pack_into("<ii", bmp, 18, 640, -480)  # top-down BMPs have h < 0
    struct.pack_into("<H", bmp, 28, 24)
    ppm = b"P6\n# a comment\n320 200\n255\n" + b"\x00" * 10
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_image(
            _media_df(spark, {1: bytes(bmp), 2: ppm, 3: b"\x89PNG not parsed"})
        ).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (640, 480, 3)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (320, 200, 3)
    assert out[3]["width"] is None  # codec format → null features, no crash


def test_multimodal_real_wav_features(spark):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    rate, n = 8000, 4000  # 0.5 s mono sine at full scale
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(30000 * math.sin(2 * math.pi * 440 * i / rate)))
                for i in range(n)
            )
        )
    out = {
        r["doc_id"]: r
        for r in multimodal.extract_audio_features(
            _media_df(spark, {1: buf.getvalue(), 2: b"not audio at all"})
        ).collect()
    }
    r1 = out[1]
    assert (r1["sample_rate"], r1["n_channels"], r1["n_frames"]) == (rate, 1, n)
    assert r1["duration_ms"] == 500
    # RMS of a full-scale sine ≈ amplitude/√2
    assert abs(r1["rms"] - 30000 / math.sqrt(2)) < 300
    assert out[2]["sample_rate"] is None


def test_multimodal_resize_and_frames(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 1000), (2, "y" * 100)], "doc_id long, text string"
    )
    media = multimodal.attach_payload(docs, kind="video")
    resized = {r["doc_id"]: r for r in multimodal.resize_image(media, 32, 32, fake=True).collect()}
    assert resized[1]["width"] == 32 and len(resized[1]["payload"]) == 32 * 32 // 64
    frames = multimodal.sample_frames(media, every_n_bytes=256, fake=True).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 1000 bytes → 3 frames; doc 2: 100 bytes → min 1 frame
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    assert by_doc[1][0]["frame_idx"] == 0 and len(bytes(by_doc[1][0]["frame"])) == 256


def test_multimodal_real_resize_roundtrip(spark):
    """REAL nearest-neighbor resize on decodable formats: a 4x4 PPM and a
    4x2 BMP shrink to 2x2, pixels matching the numpy reference; codec
    payloads yield null (a PIL kernel slots into the same shape)."""
    import numpy as np
    import struct as _s

    # 4x4 PPM with distinct pixel values 0..47
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    ppm = b"P6\n4 4\n255\n" + px.tobytes()
    # 4x2 bottom-up BMP (24bpp): rows padded to 4 bytes (4*3=12, already aligned)
    bpx = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    header = _s.pack(
        "<2sIHHI" + "IiiHHIIiiII",
        b"BM", 54 + 24, 0, 0, 54, 40, 4, 2, 1, 24, 0, 24, 0, 0, 0, 0,
    )
    bmp = header + bpx[::-1].tobytes()
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_image(
            _media_df(spark, {1: ppm, 2: bmp, 3: b"\x89PNG nope"}), 2, 2
        ).collect()
    }
    # PPM: rows/cols 0,2 of the source under nearest-neighbor (i*4)//2
    got = multimodal._decode_pixels(bytes(out[1]["payload"]))
    assert got is not None and got[1] == "ppm"
    ri = (np.arange(2) * 4) // 2
    assert (got[0] == px[ri][:, ri]).all()
    # BMP: round-trips through the bottom-up padded encoding
    got2 = multimodal._decode_pixels(bytes(out[2]["payload"]))
    assert got2 is not None and got2[1] == "bmp"
    ri2 = (np.arange(2) * 2) // 2
    ci2 = (np.arange(2) * 4) // 2
    assert (got2[0] == bpx[ri2][:, ci2]).all()
    assert out[3]["payload"] is None  # codec format → null, no crash


def test_multimodal_real_ppm_stream_frame_sampling(spark):
    """REAL frame sampling over a raw PPM frame stream: every 2nd of 5
    frames comes back as a standalone pixel-exact PPM; codec payloads
    yield zero rows."""
    import numpy as np

    frames = []
    for i in range(5):
        px = np.full((2, 2, 3), i * 10, dtype=np.uint8)
        frames.append(b"P6\n2 2\n255\n" + px.tobytes())
    stream = b"".join(frames)
    out = multimodal.sample_frames(
        _media_df(spark, {1: stream, 2: b"\x00\x00\x00 ftypmp42 not raw"}),
        every_n_frames=2,
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    got = [bytes(r["frame"]) for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])]
    assert got == [frames[0], frames[2], frames[4]]
    assert 2 not in by_doc  # codec container -> zero rows, no crash


def test_ppm_stream_malformed_header_yields_no_crash():
    """A payload starting 'P6' but truncated/malformed mid-header must not
    raise (sample_frames' contract: undecodable payloads yield zero rows);
    frames parsed before the corruption are kept."""
    import numpy as np

    # truncated immediately after magic
    assert multimodal._split_ppm_stream(b"P6") == []
    # header cut mid-token
    assert multimodal._split_ppm_stream(b"P6\n2 2") == []
    # comment with no trailing newline -> b.index raises internally, caught
    assert multimodal._split_ppm_stream(b"P6\n# no newline") == []
    # non-numeric dimension token
    assert multimodal._split_ppm_stream(b"P6\nxx 2\n255\n" + b"\x00" * 12) == []
    # one good frame, then garbage header: good frame survives
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = b"P6\n2 2\n255\n" + px.tobytes()
    out = multimodal._split_ppm_stream(good + b"P6\n2 ")
    assert out == [good]


def test_write_read_xml_roundtrip_with_markup(tmp_path, spark):
    """Writer half: XML-special characters in title/comment/text survive
    the write → chunk → parse round trip."""
    from accumulo_wikisearch_spark.sources.xml import (
        read_wikipedia_xml,
        write_wikipedia_xml,
    )

    rows = [
        (1, "a & b < c > d", "2024-01-01T00:00:00Z", "c&c", "x < y && z > w"),
        (2, "plain", "2024-01-02T00:00:00Z", "", ""),
    ]
    pages = spark.createDataFrame(
        rows, "id long, title string, timestamp string, comment string, text string"
    )
    out = str(tmp_path / "enwiki")
    write_wikipedia_xml(pages, out)
    back = {r["id"]: r for r in read_wikipedia_xml(spark, out).collect()}
    assert len(back) == 2
    assert back[1]["title"] == "a & b < c > d"
    assert back[1]["text"] == "x < y && z > w"
    assert back[1]["comments"] == "c&c"
    assert back[2]["text"] == ""
    assert all(r["language"] == "enwiki" for r in back.values())


def test_write_read_xml_preserves_cr_and_survives_control_chars(tmp_path, spark):
    """CR must survive (raw CR is parser-normalized to LF — written as
    &#13;); XML-1.0-unrepresentable control chars become U+FFFD instead
    of silently losing the page."""
    from accumulo_wikisearch_spark.sources.xml import (
        read_wikipedia_xml,
        write_wikipedia_xml,
    )

    rows = [
        (1, "t", "2024-01-01T00:00:00Z", "", "line1\r\nline2"),
        (2, "u", "2024-01-01T00:00:00Z", "", "bad\x01ctl"),
    ]
    pages = spark.createDataFrame(
        rows, "id long, title string, timestamp string, comment string, text string"
    )
    out = str(tmp_path / "enwiki")
    write_wikipedia_xml(pages, out)
    back = {r["id"]: r for r in read_wikipedia_xml(spark, out).collect()}
    assert len(back) == 2  # no silent row loss
    assert back[1]["text"] == "line1\r\nline2"
    assert back[2]["text"] == "bad�ctl"


def test_extract_pages_partial_blob_yields_only_complete_pages():
    """Parity with the reference's AggregatingRecordReader truncation
    semantics (ingest/.../reader/AggregatingRecordReaderTest.java:186-244,
    testPartialXML / testPartialXML2WithNoPartialRecordsReturned): a blob
    that starts mid-record and/or ends mid-record yields ONLY the
    complete records between, in order — partial records are never
    returned."""
    from accumulo_wikisearch_spark.sources.xml import extract_pages, parse_page

    def page(pid, title):
        return (
            f"<page><id>{pid}</id><title>{title}</title>"
            f"<revision><timestamp>2011-01-01T00:00:00Z</timestamp>"
            f"<comment>c</comment><text>t</text></revision></page>"
        )

    # head-truncated (starts inside a page) + tail-truncated (ends inside)
    blob = page(1, "A")[40:] + page(2, "C") + page(3, "E")[:-20]
    frags = extract_pages(blob)
    assert len(frags) == 1
    art = parse_page(frags[0], "en")
    assert art is not None and art["id"] == 2 and art["title"] == "C"
    # fully-complete blob: all records, in order
    whole = page(1, "A") + page(2, "C") + page(3, "E")
    got = [parse_page(f, "en")["id"] for f in extract_pages(whole)]
    assert got == [1, 2, 3]
