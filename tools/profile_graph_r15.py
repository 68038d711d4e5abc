"""Per-statement timing of build_index's graph construction (driver-side
py4j/analysis only — no actions). Mirrors operators/ingest.py:build_index.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F, Window


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.config import EngineConfig
    from accumulo_wikisearch_spark.functions.normalize import (
        normalize_col,
        tokenize_col,
    )
    from accumulo_wikisearch_spark.operators.ingest import _global_index_from_fi
    from accumulo_wikisearch_spark.sources.corpus import SCALAR_FIELDS, load_articles

    spark = get_spark("wikisearch-profile-graph")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()

    config = EngineConfig(unevaluated_fields=frozenset({"TEXT"}))
    scalar_fields = SCALAR_FIELDS
    text_col = "text"

    for rep in range(3):
        marks = []
        t = [time.time()]

        def mark(name):
            t.append(time.time())
            marks.append((name, t[-1] - t[-2]))

        articles = load_articles(spark, sf_dir)
        mark("load_articles")

        base = articles.withColumn(
            "partition_id", (F.col("id") % config.num_partitions).cast("int")
        ).withColumn("doc_id", F.col("id").cast("long"))
        mark("base")

        fv_structs = [
            F.struct(
                F.lit(fname).alias("field"), F.col(col).cast("string").alias("value")
            )
            for fname, col in scalar_fields.items()
        ]
        doc_fields = (
            base.select(
                "partition_id",
                "language",
                "doc_id",
                F.explode(F.array(*fv_structs)).alias("fv"),
            )
            .select("partition_id", "language", "doc_id", "fv.field", "fv.value")
            .where(F.col("value").isNotNull())
        )
        mark("doc_fields")

        scalar_fi = doc_fields.select(
            "partition_id",
            "field",
            normalize_col("value").alias("norm_value"),
            "language",
            "doc_id",
        )
        mark("scalar_fi")

        tokenized = base.withColumn(
            "_toks", tokenize_col(F.col(text_col), mode=config.tokenizer)
        )
        mark("tokenized")

        text_fi = (
            tokenized.select(
                "partition_id",
                "language",
                "doc_id",
                F.explode(F.col("_toks")).alias("norm_value"),
            )
            .withColumn("field", F.lit("TEXT"))
            .select("partition_id", "field", "norm_value", "language", "doc_id")
        )
        mark("text_fi")

        field_index = scalar_fi.unionByName(text_fi)
        mark("union")

        global_index = _global_index_from_fi(field_index, config.uid_max)
        mark("global_index")

        reverse_index = global_index.withColumn(
            "norm_value", F.reverse(F.col("norm_value"))
        )
        mark("reverse_index")

        all_fields = field_index.select("field", "language").distinct()
        indexed_expr = F.lit(True)
        freq = doc_fields.groupBy("field", "language").agg(F.count("*").alias("freq"))
        metadata = all_fields.join(freq, ["field", "language"], "left").select(
            "field",
            "language",
            indexed_expr.alias("indexed"),
            F.lit(config.normalizer).alias("normalizer"),
            F.coalesce(F.col("freq"), F.lit(0)).alias("freq"),
        )
        mark("metadata")

        all_toks = tokenize_col(F.col(text_col), distinct=False, mode=config.tokenizer)
        tokens_pos = base.select(
            "partition_id",
            "language",
            "doc_id",
            F.size(all_toks).alias("_len"),
            F.posexplode(all_toks).alias("pos", "norm_value"),
        )
        term_index = (
            tokens_pos.groupBy("partition_id", "language", "doc_id", "norm_value")
            .agg(
                F.count("*").alias("occurrences"),
                F.sort_array(F.collect_list("pos")).alias("offsets"),
                F.first("_len").alias("_len"),
            )
            .withColumn("tf", F.col("occurrences") / F.col("_len"))
            .select(
                "partition_id",
                "language",
                "doc_id",
                "norm_value",
                "occurrences",
                "tf",
                "offsets",
                F.col("_len").cast("long").alias("doc_len"),
            )
        )
        mark("term_index")

        entry_structs = [
            F.struct(F.lit("TEXT").alias("field"), F.col("_toks").alias("vals"))
        ] + [
            F.struct(
                F.lit(fname).alias("field"),
                F.filter(
                    F.array(normalize_col(F.col(col).cast("string"))),
                    lambda x: x.isNotNull(),
                ).alias("vals"),
            )
            for fname, col in scalar_fields.items()
        ]
        fields_map = F.map_from_entries(
            F.filter(
                F.array(*entry_structs),
                lambda e: e["vals"].isNotNull() & (F.size(e["vals"]) > 0),
            )
        )
        per_row = tokenized.select(
            "partition_id", "language", "doc_id", fields_map.alias("fields")
        ).where(F.size(F.map_keys(F.col("fields"))) > 0)
        docs_wide = per_row
        mark("docs_wide")

        documents = base.select(
            "partition_id", "language", "doc_id", F.col(text_col).alias("text")
        )
        mark("documents")

        total = t[-1] - t[0]
        print(f"rep{rep}: total={total:.3f}")
        for name, dt in marks:
            print(f"   {name:14s} {dt*1000:7.1f} ms")


if __name__ == "__main__":
    main()
