"""CLI serving front tests (the REST-endpoint analogue)."""

import io
import json


def test_cli_query_ids(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--ids-only", "TEXT == 'dup'"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert rows and all("doc_id" in r for r in rows)


def test_cli_content_pointer(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--content", "DOCUMENT:2/en/42"], out=out)
    # pointer grammar parsed; row only if doc 42 is lang 'en' partition 2
    assert rc == 0


def test_cli_scored_with_limit(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--scored", "dup", "--limit", "3"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(rows) <= 3
    occs = [r["occurrences"] for r in rows]
    assert occs == sorted(occs, reverse=True)


def test_cli_usage_without_args(spark):
    from accumulo_wikisearch_spark.cli import run

    assert run([], out=io.StringIO()) == 2


def test_cli_tfidf(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--tfidf", "dup,key", "--limit", "5"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert rows and all("score" in r and "doc_id" in r for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cli_cardinalities(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--cardinalities", "dup,src3"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    got = {(r["term"], r["field"]) for r in rows}
    assert ("dup", "TEXT") in got and ("src3", "SOURCE") in got
    assert all(r["n_docs"] > 0 for r in rows)


def test_cli_bm25(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--bm25", "dup,key", "--limit", "3"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert rows and all({"doc_id", "score"} <= set(r) for r in rows)


def test_cli_explain(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--explain", "TEXT == 'dup' and TEXT == 'key'"], out=out)
    assert rc == 0
    plan = json.loads(out.getvalue())
    assert plan["path"] == "optimized" and plan["cardinalities"]


def test_cli_more_like(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--more-like", "7", "--limit", "3"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert rows and all({"doc_id", "score", "n_shared"} <= set(r) for r in rows)
    assert all(r["doc_id"] != 7 for r in rows)


def test_cli_phrase(spark, sf_dir):
    from accumulo_wikisearch_spark.cli import run

    out = io.StringIO()
    rc = run(["--sf-dir", sf_dir, "--phrase", "order,fast", "--limit", "3"], out=out)
    assert rc == 0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert all({"doc_id", "n_matches"} <= set(r) for r in rows)
