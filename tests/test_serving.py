"""REST front tests — endpoint parity with the reference web service."""

import json
import urllib.request

import pytest

from accumulo_wikisearch_spark.serving import start_server


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    srv = start_server(get_engine(spark, sf_dir))
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    assert _get(f"{server}/health") == (200, {"status": "ok"})


def test_query_endpoint_ids(server):
    code, out = _get(f"{server}/query?query=TEXT%20%3D%3D%20%27dup%27&ids=1")
    assert code == 200 and out["count"] > 0
    assert all("doc_id" in r for r in out["results"])


def test_query_endpoint_documents_with_auths(server):
    code, out = _get(
        f"{server}/query?query=TEXT%20%3D%3D%20%27dup%27&auths=en&limit=3"
    )
    assert code == 200 and out["count"] <= 3
    for r in out["results"]:
        assert r["language"] == "en" and r["pointer"].startswith("DOCUMENT:")


def test_scored_endpoint(server):
    code, out = _get(f"{server}/scored?term=dup&limit=2")
    assert code == 200 and out["count"] <= 2
    occs = [r["occurrences"] for r in out["results"]]
    assert occs == sorted(occs, reverse=True)


def test_missing_param_is_400(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/query")
    assert ei.value.code == 400


def test_unknown_route_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/nope")
    assert ei.value.code == 404


def _get_raw(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


Q = "query=TEXT%20%3D%3D%20%27dup%27&ids=1&limit=2"


def test_query_xml_format(server):
    from xml.etree import ElementTree as ET

    code, ctype, body = _get_raw(f"{server}/query/xml?{Q}")
    assert code == 200 and ctype == "application/xml"
    root = ET.fromstring(body)
    assert root.tag == "results" and int(root.get("count")) <= 2
    docs = root.findall("document")
    assert len(docs) == int(root.get("count"))
    assert all(f.get("name") for d in docs for f in d.findall("field"))


def test_query_yaml_format(server):
    code, ctype, body = _get_raw(f"{server}/query/yaml?{Q}")
    assert code == 200 and ctype == "application/x-yaml"
    text = body.decode()
    assert text.startswith("count:") and "results:" in text
    assert "- doc_id:" in text or "- partition_id:" in text


def test_query_html_format(server):
    code, ctype, body = _get_raw(f"{server}/query/html?{Q}")
    assert code == 200 and ctype == "text/html"
    text = body.decode()
    assert "<table" in text and "<th>" in text and "results</p>" in text


def test_query_json_format_route_matches_default(server):
    _, out_default = _get(f"{server}/query?{Q}")
    _, out_json = _get(f"{server}/query/json?{Q}")
    assert out_default == out_json


def test_query_unknown_format_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/query/toml?{Q}")
    assert ei.value.code == 404


def test_bm25_endpoint(server):
    code, out = _get(f"{server}/bm25?terms=dup,key&limit=5")
    assert code == 200
    assert out["results"] and all({"doc_id", "score"} <= set(r) for r in out["results"])


def test_morelike_endpoint(server):
    code, out = _get(f"{server}/morelike?doc_id=7&limit=5")
    assert code == 200
    assert out["results"] and all(r["doc_id"] != 7 for r in out["results"])


def test_explain_endpoint(server):
    code, out = _get(f"{server}/explain?query=" + urllib.parse.quote("TEXT == 'dup'"))
    assert code == 200
    assert out["path"] == "optimized" and out["exact_coverage"]


def test_phrase_endpoint(server):
    code, out = _get(f"{server}/phrase?terms=order,fast&limit=5")
    assert code == 200
    assert all({"doc_id", "n_matches"} <= set(r) for r in out["results"])


def test_ui_page(server):
    """/ and /ui serve the search form (ui.html parity): query input,
    one auth checkbox per corpus language, results iframe → /query/html."""
    import urllib.request

    for path in ("/", "/ui"):
        with urllib.request.urlopen(f"{server}{path}", timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "text/html"
            body = r.read().decode()
        assert 'name="query"' in body and "/query/html" in body
        # language checkboxes come from the index metadata
        assert "value='en'" in body and "value='zh'" in body
        assert "iframe" in body
