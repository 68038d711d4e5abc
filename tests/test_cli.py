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


def test_cli_describe_catalog(spark, tmp_path):
    from accumulo_wikisearch_spark.cli import run
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.operators.compaction import compact_index, write_delta
    from accumulo_wikisearch_spark.operators.ingest import build_index, write_index

    cfg = EngineConfig(num_partitions=1)
    arts = spark.createDataFrame(
        [(0, "enwiki", "tok", "t0")], "id long, language string, text string, title string"
    )
    path = str(tmp_path / "cat")
    write_index(build_index(arts, cfg, {"ID": "id", "TITLE": "title"}), path)
    write_delta(
        build_index(
            spark.createDataFrame(
                [(1, "enwiki", "tok", "t1")],
                "id long, language string, text string, title string",
            ),
            cfg,
            {"ID": "id", "TITLE": "title"},
        ),
        path,
        "b0",
    )
    compact_index(spark, path, cfg)
    out = io.StringIO()
    rc = run(["--describe", path], out=out)
    assert rc == 0
    d = json.loads(out.getvalue())
    assert d["current_version"] == 1
    assert d["versions"][0]["kind"] == "fold"
    assert d["pending_deltas"] == []


def test_wikisearch_open(spark, tmp_path):
    """Wikisearch.open: live facade by default, frozen pin with at_version."""
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.operators.compaction import compact_index, write_delta
    from accumulo_wikisearch_spark.operators.ingest import build_index, write_index

    cfg = EngineConfig(num_partitions=1)
    sch = "id long, language string, text string, title string"
    sf = {"ID": "id", "TITLE": "title"}
    path = str(tmp_path / "cat2")
    write_index(
        build_index(spark.createDataFrame([(0, "enwiki", "tok", "t0")], sch), cfg, sf),
        path,
    )
    write_delta(
        build_index(spark.createDataFrame([(1, "enwiki", "tok", "t1")], sch), cfg, sf),
        path,
        "b0",
    )
    compact_index(spark, path, cfg)  # v1 = 2 docs
    write_delta(
        build_index(spark.createDataFrame([(2, "enwiki", "tok", "t2")], sch), cfg, sf),
        path,
        "b1",
    )
    live = Wikisearch.open(spark, path, cfg)
    pinned = Wikisearch.open(spark, path, cfg, at_version=1)
    assert live.query("TEXT == 'tok'").count() == 3  # probe folds b1
    assert pinned.query("TEXT == 'tok'").count() == 2  # frozen at v1
