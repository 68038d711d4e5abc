"""JSONL source adapter tests: explicit schema, corrupt-line quarantine,
derived n_chars, and end-to-end ingest through the engine."""

from accumulo_wikisearch_spark.sources.jsonl import (
    corrupt_record_stats,
    corrupt_records,
    load_articles_jsonl,
    read_documents_jsonl,
)


def _write(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


GOOD = [
    '{"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "s1", "n_chars": 16}',
    '{"doc_id": 2, "text": "delta beta", "lang": "fr", "source": "s2"}',
    '{"doc_id": 3, "text": "epsilon", "lang": "en", "source": "s1", "n_chars": 7}',
]
BAD = ['{"doc_id": 4, "text": "unterminated', "not json at all"]


def test_read_documents_jsonl_quarantines_corrupt(spark, tmp_path):
    path = _write(tmp_path, GOOD + BAD)
    good = read_documents_jsonl(spark, path)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    # n_chars derived when absent
    assert rows[2]["n_chars"] == len("delta beta")
    assert rows[1]["n_chars"] == 16
    bad = corrupt_records(spark, path).collect()
    assert len(bad) == 2
    stats = corrupt_record_stats(spark, path).collect()[0]
    assert (stats["n_good"], stats["n_corrupt"]) == (3, 2)


def test_jsonl_ingests_and_queries_end_to_end(spark, tmp_path):
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.sources.corpus import SCALAR_FIELDS

    path = _write(tmp_path, GOOD)
    arts = load_articles_jsonl(spark, path)
    eng = Wikisearch.ingest(
        arts, EngineConfig(), SCALAR_FIELDS, unique_ids=True
    )
    got = sorted(r["doc_id"] for r in eng.query("TEXT == 'beta'").collect())
    assert got == [1, 2]
