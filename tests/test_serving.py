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
