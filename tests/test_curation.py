"""Unit tests for the training-data curation operators (chunking,
decontamination, repetition stats, canonical selection). The sf-corpus
oracle equivalence is covered by the driver gate (tools/check_oracle.py);
these pin the semantics on hand-built edge cases."""

from pyspark.sql import functions as F

from accumulo_wikisearch_spark.operators.curation import (
    canonical_docs,
    chunk_documents,
    decontaminate,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_sizes_and_stride(spark):
    # 100 tokens, size 64 stride 48 → chunks at 1 and 49: sizes 64 and 52
    text = " ".join(f"t{i}" for i in range(100))
    out = chunk_documents(_docs(spark, [(1, text)])).orderBy("chunk_id").collect()
    assert [(r.chunk_id, r.n_tokens) for r in out] == [(0, 64), (1, 52)]


def test_chunk_short_and_empty_docs(spark):
    out = chunk_documents(_docs(spark, [(1, "a b c"), (2, ""), (3, "  ")])).collect()
    assert [(r.doc_id, r.chunk_id, r.n_tokens) for r in out] == [(1, 0, 3)]


def test_chunk_hash_identifies_equal_windows(spark):
    df = _docs(spark, [(1, "x y z"), (2, "x y z"), (3, "x y q")])
    out = chunk_documents(df).collect()
    h = {r.doc_id: r.chunk_hash for r in out}
    assert h[1] == h[2] and h[1] != h[3]


def test_decontaminate_flags_shared_shingle(spark):
    # doc 0 is eval (0 % 97 == 0); doc 1 shares its 5-gram, doc 2 doesn't
    shared = "alpha beta gamma delta epsilon"
    df = _docs(
        spark,
        [
            (0, f"intro {shared} outro"),
            (1, f"x {shared} y"),
            (2, "one two three four five six"),
        ],
    )
    got = {r.doc_id: r.contaminated for r in decontaminate(df).collect()}
    assert got == {1: 1, 2: 0}


def test_decontaminate_explicit_eval_set(spark):
    df = _docs(spark, [(10, "a b c d e f"), (11, "a b c d e g"), (12, "p q r s t u")])
    ev = df.where(F.col("doc_id") == 10)
    got = {r.doc_id: r.contaminated for r in decontaminate(df, eval_docs=ev).collect()}
    # doc 11 shares shingle "a b c d e" with eval doc 10; doc 12 clean
    assert got == {11: 1, 12: 0}


def test_repetition_run_not_split_by_sort_neighbors(spark):
    # "a b a b a b a" → bigrams: [a b]x3 + [b a]x3, n_bigrams=6, top=3
    out = repetition_stats(_docs(spark, [(1, "a b a b a b a")])).collect()[0]
    assert (out.n_bigrams, out.top_bigram_cnt, out.repetitive) == (6, 3, 1)


def test_repetition_all_distinct(spark):
    out = repetition_stats(_docs(spark, [(1, "a b c d e f g h i j k")])).collect()[0]
    assert (out.n_bigrams, out.top_bigram_cnt, out.repetitive) == (10, 1, 0)


def test_repetition_single_token_excluded(spark):
    assert repetition_stats(_docs(spark, [(1, "solo")])).count() == 0


def test_canonical_min_id_and_member_count(spark):
    df = _docs(spark, [(5, "same"), (2, "same"), (9, "same"), (7, "other")])
    got = {r.canonical_id: r.n_members for r in canonical_docs(df).collect()}
    assert got == {2: 3, 7: 1}


def test_redact_counts_and_hash_change(spark):
    from accumulo_wikisearch_spark.operators.curation import redact_text

    df = _docs(
        spark,
        [
            (1, "contact bob@example.com or alice@test.org id 1234567 now"),
            (2, "clean text with short 123 number"),
            (3, "contact <EMAIL> or <EMAIL> id <NUM> now"),  # post-redaction twin of 1
        ],
    )
    out = {r.doc_id: r for r in redact_text(df).collect()}
    assert (out[1].n_emails, out[1].n_longnums) == (2, 1)
    assert (out[2].n_emails, out[2].n_longnums) == (0, 0)
    # doc 1 redacts INTO doc 3's text: hashes converge
    assert out[1].redacted_hash == out[3].redacted_hash


def test_keep_list_stages(spark):
    from accumulo_wikisearch_spark.operators.curation import keep_list

    stop = "the a in of"
    good = " ".join(f"w{i}" for i in range(20))
    # differs from doc 1 only in the final token: 1 of 22 shingles changes,
    # shingle-jaccard 21/23 ≈ 0.91 > 0.8
    near = f"{good} the a in zz"
    df = _docs(
        spark,
        [
            (1, f"{good} {stop}"),            # survives (min of near-dup cluster)
            (2, f"{good} {stop}"),            # exact dup of 1 → dropped
            (3, near),                        # near dup of 1 → dropped
            (4, "too short"),                 # quality fail
            (5, "unique " * 24 + stop),       # distinct-ratio fail (1 token repeated)
        ],
    )
    assert {r.doc_id for r in keep_list(df).collect()} == {1}


def test_pack_sequences_contiguous_budget(spark):
    """Hand-checked packing: per-shard cumulative token offsets assign each
    doc to floor(start/budget); shards pack independently."""
    from accumulo_wikisearch_spark.operators.curation import pack_sequences

    rows = [
        (1, "a", "w " * 5),   # 5 toks, start 0  -> seq 0
        (2, "a", "w " * 4),   # start 5          -> seq 0
        (3, "a", "w " * 4),   # start 9          -> seq 1
        (4, "a", "w " * 9),   # start 13         -> seq 1 (straddles)
        (5, "b", "w " * 7),   # start 0          -> seq 0 (own shard)
        (6, "b", ""),         # empty -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["shard"], r["seq_id"], r["start_offset"], r["n_tokens"])
        for r in pack_sequences(docs, budget=8).collect()
    }
    assert got == {
        1: ("a", 0, 0, 5),
        2: ("a", 0, 5, 4),
        3: ("a", 1, 9, 4),
        4: ("a", 1, 13, 9),
        5: ("b", 0, 0, 7),
    }


def test_chunk_dedup_keeps_first_occurrence(spark):
    from accumulo_wikisearch_spark.operators.curation import chunk_dedup

    body = " ".join(f"w{i}" for i in range(64))
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, "completely different tokens here")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["chunk_id"]): r["keep"] for r in chunk_dedup(docs).collect()}
    # doc1 chunk0 == doc2 chunk0 → doc1 keeps, doc2 drops; doc3 unique
    assert out[(1, 0)] == 1 and out[(2, 0)] == 0
    assert out[(3, 0)] == 1


def test_domain_cap_null_domain_is_capped_too(spark):
    """Regression: plain semi/anti join keys never match NULL, which
    exempted a >cap null-domain group from the cap."""
    from accumulo_wikisearch_spark.operators.curation import domain_cap

    rows = [(i, None if i < 25 else "a") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = domain_cap(df, max_per_domain=20).collect()
    nulls = [r["doc_id"] for r in out if r["source"] is None]
    assert len(nulls) == 20
    assert sorted(nulls) == list(range(20))  # lowest doc_ids win
    assert len(out) == 25  # 20 null + 5 'a' (under cap, untouched)


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    """The Bloom prefilter is sketch-then-verify: its output must be
    row-identical to the exact path (false positives die in the exact
    semi-join; false negatives cannot exist)."""
    from accumulo_wikisearch_spark.operators.curation import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = decontaminate(docs)
    bloom = decontaminate_bloom(docs)
    assert bloom.exceptAll(exact).count() == 0
    assert exact.exceptAll(bloom).count() == 0
    # tiny filters too: a 1-word bitset saturates (every probe positive)
    # and the exact verify still keeps the answer right
    tiny = decontaminate_bloom(docs, n_words=1)
    assert tiny.exceptAll(exact).count() == 0
