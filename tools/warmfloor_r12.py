"""r12 A/B warm floors for the two sf1-drifted lanes (VERDICT r11
'Next round' #4): ``during_ingest_8q`` and ``throughput_24q_8clients``
— the two rows whose sf1 moves were attributed to host variance two
rounds running without a direct A/B.

One PROCESS = one fresh JVM = one measurement session: untimed engine
build + warm-up, then 5 timed reps of each lane (floors + medians
printed as JSON). The A/B driver alternates this script between HEAD
and the previous round's commit (in a worktree) on a quiet machine:

    for i in 1 2 3; do
      (cd /root/repo      && SPARK_GRAFT_SF_DIR=$SF python tools/warmfloor_r12.py)
      (cd /tmp/wf_r11tree && SPARK_GRAFT_SF_DIR=$SF python tools/warmfloor_r12.py)
    done | tee -a tools/warmfloor_r12.txt
"""

from __future__ import annotations

import itertools
import json
import os
import random
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from accumulo_wikisearch_spark.operators.ingest import build_index
    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.sources.corpus import (
        SCALAR_FIELDS,
        get_engine,
        load_articles,
    )
    from accumulo_wikisearch_spark.streaming.incremental import merge_global_index

    spark = get_spark("warmfloor-r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    eng = get_engine(spark, sf_dir)
    eng.index.materialize()

    ws = {
        "q_and3": "TEXT == 'key' and TEXT == 'vector' and TEXT == 'the'",
        "q_and4": "TEXT == 'key' and TEXT == 'fast' and TEXT == 'line' and TEXT == 'the'",
        "q_rare_and": "TEXT == 'dup' and TEXT == 'key'",
        "q_and_or": "TEXT == 'fast' and (TEXT == 'slow' or TEXT == 'stream')",
        "q_rare_pair": "TEXT == 'dup' and SOURCE == 'src3'",
        "q_or_eq": "SOURCE == 'src3' or SOURCE == 'src7'",
        "q_wildcard": "SOURCE =~ 'src1.*'",
        "q_unfielded": "'dup'",
        "q_mixed_or": "TEXT == 'dup' or SOURCE >= 'src18'",
    }

    # ---- throughput_24q_8clients (bench.py's exact query batch) ----
    pool = ["the", "key", "fast", "line", "vector", "slow", "stream", "data",
            "value", "index", "dup", "point", "node", "graph", "set", "map"]
    rng = random.Random(42)
    batch = []
    for terms in itertools.islice(itertools.combinations(pool, 3), 200):
        batch.append(" and ".join(
            f"TEXT == '{t}'" for t in rng.sample(terms, rng.choice([2, 3]))
        ))
    rng.shuffle(batch)
    batch = batch[:24]

    def run_one(jexl):
        return eng.query(jexl).count()

    with ThreadPoolExecutor(max_workers=8) as ex:  # warm plan caches
        list(ex.map(run_one, batch))
    thr = []
    for _ in range(REPS):
        t = time.time()
        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(run_one, batch))
        thr.append(round(time.time() - t, 3))

    # ---- during_ingest_8q (bench.py's writer-thread lane) ----
    for jexl in ws.values():  # warm
        eng.query(jexl).count()
    arts500 = load_articles(spark, sf_dir).limit(500)
    ing = []
    for _ in range(REPS):
        stop = threading.Event()

        def ingest_loop():
            i = 0
            while not stop.is_set():
                fresh = arts500.withColumn(
                    "id", F.col("id") + 10_000_000 + i * 1000
                )
                delta = build_index(
                    fresh, eng.index.config, SCALAR_FIELDS, unique_ids=True
                )
                merge_global_index(
                    eng.index.global_index, delta.global_index
                ).count()
                i += 1

        writer = threading.Thread(target=ingest_loop, daemon=True)
        writer.start()
        t = time.time()
        for jexl in ws.values():
            eng.query(jexl).count()
        ing.append(round(time.time() - t, 3))
        stop.set()
        writer.join(timeout=120)

    out = {}
    for name, xs in (("throughput_24q_8clients", thr), ("during_ingest_8q", ing)):
        s = sorted(xs)
        out[name] = {"reps": xs, "floor": s[0], "median": s[len(s) // 2]}
    print(json.dumps({"sf_dir": sf_dir, "cwd": os.getcwd(), **out}), flush=True)


if __name__ == "__main__":
    main()
