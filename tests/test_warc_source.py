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
