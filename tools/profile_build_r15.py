"""Decompose the index_build bench lane: driver-side graph construction
vs persist/materialize execution, per phase. Mirrors bench.py's
fresh_index_build (engine evicted per rep). Usage:
    python tools/profile_build_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.api import Wikisearch
    from accumulo_wikisearch_spark.sources.corpus import (
        SCALAR_FIELDS,
        _serving_width,
        load_articles,
    )

    spark = get_spark("wikisearch-profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    config = EngineConfig(unevaluated_fields=frozenset({"TEXT"}))
    for rep in range(reps):
        t0 = time.time()
        articles = load_articles(spark, sf_dir)
        t1 = time.time()
        eng = Wikisearch.ingest(articles, config, SCALAR_FIELDS, unique_ids=True)
        t2 = time.time()
        w = _serving_width(f"{sf_dir}/documents.parquet", spark)
        cur = getattr(articles, "_ws_partitions", None) or articles.rdd.getNumPartitions()
        t3 = time.time()
        eng.index.persist(w, current_partitions=cur)
        t4 = time.time()
        eng.index.field_index.count()
        t5 = time.time()
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            list(
                ex.map(
                    lambda df: df.count(),
                    [eng.index.global_index, eng.index.docs_wide],
                )
            )
        t6 = time.time()
        print(
            f"rep{rep}: load={t1-t0:.3f} build_graph={t2-t1:.3f} "
            f"width_probe={t3-t2:.3f} persist={t4-t3:.3f} "
            f"fi_count={t5-t4:.3f} gi+dw_count={t6-t5:.3f} "
            f"total={t6-t0:.3f}"
        )
        eng.index.unpersist_serving()


if __name__ == "__main__":
    main()
