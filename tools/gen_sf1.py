"""Regenerate the gitignored sf1 rehearsal corpus into ``_sf1/`` — the
r7 recipe (docs/SCALE.md "sf1 rehearsal (r7)"): sf0.1 replicated 10×
with shifted unique ids (50k docs / 20k embeddings / 1M events / 6M
lineitem), dimension values (user_id, ts, lang, source, tokens, TPC-H
dims) left unshifted so every query's selectivity scales with the data.
Small dimension tables copy verbatim.

    python tools/gen_sf1.py        # writes _sf1/*.parquet
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = str(Path(__file__).resolve().parent.parent / "_sf1")

# table -> (unique id column to shift, per-copy stride)
REPLICATED = {
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
}
VERBATIM = ["orders", "customer", "supplier", "part", "nation", "region"]


def main() -> None:
    from pyspark.sql import functions as F

    from accumulo_wikisearch_spark.session import get_spark

    spark = get_spark("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for t, (key, stride) in REPLICATED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for c in range(10):
            part = df.withColumn(key, F.col(key) + F.lit(c * stride))
            out = part if out is None else out.unionByName(part)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(t, spark.read.parquet(f"{DST}/{t}.parquet").count())
    for t in VERBATIM:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(t, "verbatim")


if __name__ == "__main__":
    main()
