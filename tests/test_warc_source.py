"""WARC source tests: record splitting, gzip members, truncation contract,
and the articles mapping."""

import gzip


def _record(rid, rtype, uri, payload: bytes) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return hdr + b"\r\n" + payload + b"\r\n\r\n"


PAYLOAD1 = b"alpha beta gamma delta"
PAYLOAD2 = b"second record text here"
WARC = (
    _record("1", "response", "http://a.example/x", PAYLOAD1)
    + _record("2", "warcinfo", "", b"software: test")
    + _record("3", "conversion", "http://b.example/y", PAYLOAD2)
)


def test_split_warc_plaintext(tmp_path, spark):
    from accumulo_wikisearch_spark.sources.warc import read_warc

    (tmp_path / "f.warc").write_bytes(WARC)
    rows = read_warc(spark, str(tmp_path / "f.warc")).collect()
    assert len(rows) == 3
    by_id = {r["record_id"]: r for r in rows}
    assert bytes(by_id["<urn:uuid:1>"]["payload"]) == PAYLOAD1
    assert by_id["<urn:uuid:3>"]["warc_type"] == "conversion"
    assert by_id["<urn:uuid:1>"]["target_uri"] == "http://a.example/x"
    assert by_id["<urn:uuid:1>"]["content_length"] == len(PAYLOAD1)


def test_split_warc_gzip_members(tmp_path, spark):
    from accumulo_wikisearch_spark.sources.warc import read_warc

    # Common Crawl layout: one gzip MEMBER per record, concatenated
    gz = b"".join(
        gzip.compress(_record(str(i), "response", f"http://e/{i}", b"p%d" % i))
        for i in range(3)
    )
    (tmp_path / "f.warc.gz").write_bytes(gz)
    rows = read_warc(spark, str(tmp_path / "f.warc.gz")).collect()
    assert len(rows) == 3
    assert sorted(bytes(r["payload"]) for r in rows) == [b"p0", b"p1", b"p2"]


def test_truncated_record_yields_prefix(tmp_path, spark):
    from accumulo_wikisearch_spark.sources.warc import read_warc

    trunc = WARC + _record("9", "response", "http://t", b"full payload")[:-20]
    (tmp_path / "t.warc").write_bytes(trunc)
    rows = read_warc(spark, str(tmp_path / "t.warc")).collect()
    assert len(rows) == 3  # the truncated 4th record is dropped, job survives


def test_articles_mapping_filters_non_documents(tmp_path, spark):
    from accumulo_wikisearch_spark.sources.warc import load_articles_warc

    (tmp_path / "f.warc").write_bytes(WARC)
    arts = load_articles_warc(spark, str(tmp_path / "f.warc")).collect()
    # warcinfo record excluded; response + conversion kept
    assert len(arts) == 2
    texts = sorted(r["text"] for r in arts)
    assert texts == sorted([PAYLOAD1.decode(), PAYLOAD2.decode()])
    assert all(r["id"] is not None and r["language"] == "default" for r in arts)

def test_negative_content_length_terminates():
    """Regression: a crafted Content-Length < 0 used to move the parse
    cursor backwards and loop forever appending records."""
    from accumulo_wikisearch_spark.sources.warc import _split_warc

    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:neg>\r\n"
        b"Content-Length: -40\r\n"
        b"\r\n"
    )
    recs = _split_warc(WARC + bad + _record("x", "response", "http://after", b"p"))
    # the 3 good leading records parse; the malformed one ends the file
    assert [r["record_id"] for r in recs] == [
        "<urn:uuid:1>",
        "<urn:uuid:2>",
        "<urn:uuid:3>",
    ]


def test_gunzip_stream_members_and_corrupt_tail():
    from accumulo_wikisearch_spark.sources.warc import (
        _gunzip_stream,
        _records_from_stream,
    )

    members = [_record(str(i), "response", f"http://e/{i}", b"x" * 1000) for i in range(5)]
    gz = b"".join(gzip.compress(m) for m in members)
    assert b"".join(_gunzip_stream(gz, chunk=64)) == b"".join(members)
    # corrupt tail: records before the corruption survive
    corrupt = gz + b"\x1f\x8b\x08\x00garbage-not-a-member"
    got = []
    try:
        for rec in _records_from_stream(_gunzip_stream(corrupt, chunk=64)):
            got.append(rec)
    except Exception:
        pass
    assert len(got) == 5


def test_streaming_parse_memory_is_bounded():
    """The decompressed stream (64 MB) must never materialize: peak
    allocation during the streamed parse stays within one record + chunk
    slack, NOT the whole-file size."""
    import tracemalloc

    from accumulo_wikisearch_spark.sources.warc import (
        _gunzip_stream,
        _records_from_stream,
    )

    record_payload = b"z" * (256 * 1024)
    one = _record("r", "response", "http://big", record_payload)
    n_records = 256  # ~64 MB decompressed
    gz = gzip.compress(one * n_records, compresslevel=1)

    tracemalloc.start()
    count = 0
    for rec in _records_from_stream(_gunzip_stream(gz)):
        count += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == n_records
    # peak should be ~ a few records + chunk slack, far below the 64 MB stream
    assert peak < 16 * 1024 * 1024, f"peak {peak} bytes — streaming not bounded"


def test_huge_content_length_does_not_buffer_stream():
    """A hostile Content-Length pointing past the whole stream must end
    the parse immediately, not slurp every remaining chunk into the
    buffer hunting for the record end."""
    import tracemalloc

    from accumulo_wikisearch_spark.sources.warc import (
        _gunzip_stream,
        _records_from_stream,
    )

    good = _record("g", "response", "http://ok", b"k" * 1000)
    bogus = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"Content-Length: 99999999999\r\n"
        b"\r\n"
    )
    # bogus header followed by 64 MB of stream that must NOT be buffered
    tail = _record("t", "response", "http://tail", b"z" * (1 << 20)) * 64
    gz = gzip.compress(good + bogus + tail, compresslevel=1)

    tracemalloc.start()
    recs = list(_records_from_stream(_gunzip_stream(gz)))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert [r["record_id"] for r in recs] == ["<urn:uuid:g>"]
    assert peak < 16 * 1024 * 1024, f"peak {peak} — hostile length buffered the stream"
