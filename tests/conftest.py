import pytest

from accumulo_wikisearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wikisearch-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def engine(spark, sf_dir):
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    return get_engine(spark, sf_dir)


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def zb_partition_filtered(df) -> bool:
    """True when some scan in df's formatted plan carries a `zb`
    PartitionFilter — the ONE definition of the fragile explain-string
    parse the z-layout plan pins share."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    return any("zb" in seg[:200] for seg in plan.split("PartitionFilters")[1:])
