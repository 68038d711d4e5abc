"""Unit tests for dedup operators (clustering; pair ops are oracle-covered
by the driver gate — tools/check_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.dedup import (
    connected_components,
    exact_duplicates,
)


def _components(spark, pairs):
    edges = spark.createDataFrame(pairs, "a_id long, b_id long")
    return {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }


def test_components_multi_hop_chain(spark):
    # a-b, b-c, c-d chained: one component labeled by the min id
    comp = _components(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_min_flows_against_edge_direction(spark):
    # min id sits at the "far end": must propagate backwards over (5,1)
    comp = _components(spark, [(5, 1), (5, 6), (6, 7)])
    assert comp == {1: 1, 5: 1, 6: 1, 7: 1}


def test_components_star_and_singleton_pair(spark):
    comp = _components(spark, [(100, 2), (100, 3), (100, 4), (8, 9)])
    assert comp[100] == 2 and comp[3] == 2 and comp[4] == 2
    assert comp[8] == 8 and comp[9] == 8


def test_exact_duplicates_canonical_is_min(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "same text"), (7, "other")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["canonical_id"] for r in exact_duplicates(docs).collect()}
    assert out == {3: 1, 5: 1}  # doc 1 is canonical, doc 7 unique
