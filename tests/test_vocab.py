"""Unit tests for corpus token statistics (vocab, bigrams, rarity).
Oracle equivalence at corpus scale is covered by the driver gate."""

from accumulo_wikisearch_spark.operators.vocab import (
    bigram_counts,
    token_rarity,
    vocab_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_tf_df_and_min_count(spark):
    df = _docs(spark, [(1, "a a b"), (2, "a c"), (3, "c")])
    got = {r.token: (r.tf, r.df) for r in vocab_counts(df, min_count=2).collect()}
    # a: tf=3 over 2 docs; c: tf=2 over 2 docs; b dropped (tf=1)
    assert got == {"a": (3, 2), "c": (2, 2)}


def test_bigram_counts_cross_doc(spark):
    df = _docs(spark, [(1, "x y x y"), (2, "x y"), (3, "solo")])
    got = {r.gram: r.cnt for r in bigram_counts(df, min_count=2).collect()}
    # "x y" appears 2x in doc1 + 1x in doc2; "y x" only once → dropped
    assert got == {"x y": 3}


def test_rarity_rare_tokens_score_higher(spark):
    # 4 docs; "common" in all (df=4 → bucket 1), "rare" in one (df=1 → 4)
    df = _docs(
        spark,
        [(1, "common rare"), (2, "common"), (3, "common"), (4, "common")],
    )
    got = {r.doc_id: (r.n_tokens, r.rarity) for r in token_rarity(df).collect()}
    assert got[1] == (2, 5)  # 4//4 + 4//1
    assert got[2] == (1, 1)


def test_rarity_counts_repeated_instances(spark):
    df = _docs(spark, [(1, "w w w"), (2, "w")])
    got = {r.doc_id: r.rarity for r in token_rarity(df).collect()}
    # df(w)=2, n=2 → bucket 1 per instance
    assert got == {1: 3, 2: 1}
