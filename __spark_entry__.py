"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The implementation lives in ``accumulo_wikisearch_spark`` (see SURVEY.md §2
for the operator inventory these queries cover).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from accumulo_wikisearch_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: a baseline-shaped boolean
    keyword query through the optimized index path."""
    from accumulo_wikisearch_spark.session import tune_runtime
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    tune_runtime(spark)
    eng = get_engine(spark, "/root/testdata/sf0.001")
    return eng.query("TEXT == 'fast' and (TEXT == 'slow' or TEXT == 'stream')")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
