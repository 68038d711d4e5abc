"""r10 Arrow-lane drift adjudication (VERDICT r9 'Next round' #2).

Runs the five drifted bench rows (text_repetition, mm_decode_image,
dedup_embedding_banded, text_embed_hashing, dedup_exact_embedding) with
10 in-session timed reps each at sf0.1 — the warm-floor method from the
round-9 memory notes that settled the q_and_or drift. Adds
dedup_exact_substring / dedup_remove_spans / text_quality /
doc_fingerprint (the rest of the drifted family) at 10 reps too.

Run on a QUIET machine, BEFORE any r10 source change:
    python tools/warmfloor_r10.py | tee tools/warmfloor_r10.txt
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.operators import dedup, multimodal, textstats

    spark = get_spark("warmfloor-r10")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs.count()
    emb.count()

    mm_media = multimodal.queries()["mm_decode_image"]

    thunks = {
        "text_repetition": lambda: textstats.text_repetition(docs).count(),
        "mm_decode_image": lambda: mm_media(spark, sf_dir).count(),
        "dedup_embedding_banded": lambda: dedup.embedding_near_dup_pairs(emb).count(),
        "text_embed_hashing": lambda: textstats.hashing_embed(docs).count(),
        "dedup_exact_embedding": lambda: dedup.exact_vector_duplicates(emb).count(),
        "text_quality": lambda: textstats.text_quality(docs).count(),
        "doc_fingerprint": lambda: textstats.doc_fingerprint(docs).count(),
        "dedup_exact_substring": lambda: dedup.duplicated_spans(docs).count(),
        "dedup_remove_spans": lambda: dedup.remove_duplicated_spans(docs).count(),
    }

    out: dict[str, dict] = {}
    for name, thunk in thunks.items():
        thunk()  # warm
        xs = []
        for _ in range(10):
            t = time.time()
            thunk()
            xs.append(round(time.time() - t, 3))
        xs_sorted = sorted(xs)
        out[name] = {
            "reps": xs,
            "floor": xs_sorted[0],
            "median": xs_sorted[5],
            "p90": xs_sorted[8],
        }
        print(json.dumps({name: out[name]}), flush=True)

    print("=== SUMMARY ===")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
