"""ORC source adapter: round-trip fidelity and scan pushdown."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.sources.orc import (
    load_articles_orc,
    read_documents_orc,
)


def _write_orc(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_orc")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.mode(
        "overwrite"
    ).orc(out)
    return out


def test_orc_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    path = _write_orc(spark, sf_dir, tmp_path)
    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    back = read_documents_orc(spark, path).select(*orig.columns)
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    path = _write_orc(spark, sf_dir, tmp_path)
    df = read_documents_orc(spark, path).where(F.col("doc_id") == 7).select(
        "doc_id", "lang"
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan
    seg = plan.split("PushedFilters", 1)[1][:200]
    assert "doc_id" in seg  # predicate reached the ORC scan
    assert df.count() == 1


def test_orc_articles_contract(spark, sf_dir, tmp_path):
    path = _write_orc(spark, sf_dir, tmp_path)
    arts = load_articles_orc(spark, path)
    assert set(arts.columns) == {"id", "language", "text", "source", "n_chars"}
    assert arts.count() == spark.read.parquet(
        f"{sf_dir}/documents.parquet"
    ).count()
