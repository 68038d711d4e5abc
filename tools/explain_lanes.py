"""Dump .explain("formatted") for the bench lanes to plans/$SPARK_GRAFT_PLANS_DIR/.

Usage:
    python tools/explain_lanes.py before          # plans/<round>/<lane>_before.txt
    python tools/explain_lanes.py after           # plans/<round>/<lane>_after.txt
    python tools/explain_lanes.py after q_and3    # one lane only

The round dir defaults to r15 (override with SPARK_GRAFT_PLANS_DIR). The
lane set mirrors bench.py's DataFrame-producing lanes (the judge checks
plan claims in OPTIMIZATION_r<NN>.md against these files). Explains run
against the same sf0.1 engine the bench uses, warm.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.sources.corpus import get_engine
    from accumulo_wikisearch_spark.operators import (
        curation,
        dedup,
        sampling,
        similarity,
        textstats,
        vocab,
    )

    spark = get_spark("wikisearch-explain")
    spark.sparkContext.setLogLevel("ERROR")
    eng = get_engine(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

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

    lanes = {name: (lambda j=jexl: eng.query(j)) for name, jexl in ws.items()}
    lanes.update(
        {
            "q_tfidf_rank": lambda: eng.scored_search_tfidf(["dup", "key"]),
            "q_bm25_rank": lambda: eng.scored_search_bm25(["dup", "key"]),
            "q_phrase": lambda: eng.phrase_search(["order", "fast"]),
            "q_count_fast": lambda: eng.count_only("TEXT == 'the'"),
            "index_build_field_index": lambda: eng.index.field_index,
            "index_build_global_index": lambda: eng.index.global_index,
            "index_build_docs_wide": lambda: eng.index.docs_wide,
            "index_build_term_index": lambda: eng.index.term_index,
            "dedup_exact": lambda: dedup.exact_duplicates(docs),
            "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs),
            "dedup_simhash": lambda: dedup.simhash(docs),
            "dedup_embedding_banded": lambda: dedup.embedding_near_dup_pairs(emb),
            "dedup_exact_embedding": lambda: dedup.exact_vector_duplicates(emb),
            "dedup_exact_substring": lambda: dedup.duplicated_spans(docs),
            "dedup_remove_spans": lambda: dedup.remove_duplicated_spans(docs),
            "dedup_semdedup": lambda: similarity.semdedup_keep(emb),
            "ann_topk": lambda: similarity.topk_bruteforce(
                emb, similarity.self_queries(emb)
            ),
            "ann_pq_adc": lambda: similarity.topk_pq_adc(
                emb, similarity.self_queries(emb)
            ),
            "ann_ivf_pq": lambda: similarity.topk_ivf_pq(
                emb, similarity.self_queries(emb)
            ),
            "ann_hybrid": lambda: similarity.hybrid_search(
                eng.query("TEXT == 'dup'").select("doc_id"), emb, query_vec_id=7
            ),
            "text_quality": lambda: textstats.text_quality(docs),
            "text_repetition": lambda: textstats.text_repetition(docs),
            "text_embed_hashing": lambda: textstats.hashing_embed(docs),
            "doc_fingerprint": lambda: textstats.doc_fingerprint(docs),
            "cur_pack_sequences": lambda: curation.pack_sequences(docs),
            "cur_chunk": lambda: curation.chunk_documents(docs),
            "cur_domain_cap": lambda: curation.domain_cap(docs),
            "cur_decontaminate": lambda: curation.decontaminate(docs),
            "vocab_counts": lambda: vocab.vocab_counts(docs),
            "sample_global_shuffle": lambda: sampling.global_shuffle(docs),
            "more_like_this": lambda: eng.more_like_this(7),
        }
    )

    for name, thunk in lanes.items():
        if only and name not in only:
            continue
        try:
            txt = explain_str(thunk())
        except Exception as e:  # keep going; record the failure
            txt = f"EXPLAIN FAILED: {e}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")


if __name__ == "__main__":
    main()
