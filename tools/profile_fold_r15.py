"""Interleaved A/B of the during_ingest writer loop: per-iteration
rebuilt delta graph (r14 shape) vs one memoized delta plan re-executed
per fold (r15). Same session, alternating windows, reports folds/s."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    window_s = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0

    from pyspark.sql import functions as F

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.operators.ingest import build_index
    from accumulo_wikisearch_spark.sources.corpus import (
        SCALAR_FIELDS,
        get_engine,
        load_articles,
    )
    from accumulo_wikisearch_spark.streaming.incremental import merge_global_index

    spark = get_spark("wikisearch-profile-fold")
    spark.sparkContext.setLogLevel("ERROR")
    eng = get_engine(spark, sf_dir)
    eng.index.materialize()
    arts = load_articles(spark, sf_dir).limit(500)

    def old_loop(deadline: float) -> int:
        i, n = 0, 0
        while time.time() < deadline:
            fresh = arts.withColumn("id", F.col("id") + 10_000_000 + i * 1000)
            delta = build_index(fresh, eng.index.config, SCALAR_FIELDS, unique_ids=True)
            merge_global_index(eng.index.global_index, delta.global_index).count()
            i += 1
            n += 1
        return n

    def new_loop(deadline: float) -> int:
        fresh = arts.withColumn("id", F.col("id") + 10_000_000)
        delta = build_index(fresh, eng.index.config, SCALAR_FIELDS, unique_ids=True)
        merged = merge_global_index(eng.index.global_index, delta.global_index)
        n = 0
        while time.time() < deadline:
            merged.count()
            n += 1
        return n

    # warm both shapes once
    old_loop(time.time() + 2)
    new_loop(time.time() + 2)
    for rnd in range(3):
        a = old_loop(time.time() + window_s)
        b = new_loop(time.time() + window_s)
        print(
            f"round {rnd}: old={a} folds ({a / window_s:.2f}/s)  "
            f"new={b} folds ({b / window_s:.2f}/s)  x{b / max(a, 1):.2f}"
        )


if __name__ == "__main__":
    main()
