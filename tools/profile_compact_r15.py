"""Decompose the compaction_2deltas lane: stage the same catalog bench.py
stages, then time compact_index's phases (merge-read load, write_index,
swap/bookkeeping) plus the per-table write breakdown."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.operators import compaction
    from accumulo_wikisearch_spark.operators.compaction import (
        delta_batches,
        load_index_with_deltas,
        write_delta,
    )
    from accumulo_wikisearch_spark.operators.ingest import build_index, write_index
    from accumulo_wikisearch_spark.sources.corpus import (
        SCALAR_FIELDS,
        get_engine,
        load_articles,
    )

    spark = get_spark("wikisearch-profile-compact")
    spark.sparkContext.setLogLevel("ERROR")
    eng = get_engine(spark, sf_dir)
    eng.index.materialize()
    arts = load_articles(spark, sf_dir).limit(2000)

    def stage() -> tuple[str, str]:
        cdir = tempfile.mkdtemp(prefix="wikisearch-profc-")
        cpath = f"{cdir}/index"
        write_index(
            build_index(arts, eng.index.config, SCALAR_FIELDS, unique_ids=True),
            cpath,
        )
        for b in range(2):
            fresh = arts.limit(250).withColumn("id", F.col("id") + 20_000_000 + b * 1000)
            write_delta(
                build_index(fresh, eng.index.config, SCALAR_FIELDS, unique_ids=True),
                cpath,
                b,
            )
        return cpath, cdir

    config = EngineConfig(unevaluated_fields=frozenset({"TEXT"}))
    for rep in range(reps):
        cpath, cdir = stage()
        try:
            t0 = time.time()
            batches = delta_batches(spark, cpath)
            merged = load_index_with_deltas(spark, cpath, config, batches=batches)
            t1 = time.time()
            tmp = f"{cpath}/_compact_tmp"
            write_index(merged, tmp)
            t2 = time.time()
            full = time.time()
            compaction.compact_index(spark, cpath, config)
            t3 = time.time()
            # count written files of the tmp (now-swapped) generation
            nfiles = sum(
                1
                for _dp, _dns, fns in os.walk(cdir)
                for f in fns
                if f.startswith("part-")
            )
            print(
                f"rep{rep}: load_merge_graph={t1-t0:.3f} write_index={t2-t1:.3f} "
                f"full_compact_after={t3-full:.3f} part_files_on_disk={nfiles}"
            )
        finally:
            shutil.rmtree(cdir, ignore_errors=True)


if __name__ == "__main__":
    main()
