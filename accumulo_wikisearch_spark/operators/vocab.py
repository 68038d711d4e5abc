"""Corpus-level token statistics: vocabulary building, n-gram counts, and
token-rarity document scoring.

The tokenizer/vocab side of a training-data pipeline (SURVEY.md §2.6
extensions): counting every token and n-gram over a 100 TB corpus, then
scoring documents by how rare their tokens are (a cheap perplexity proxy
used for quality filtering).

Scale shape:
- ``vocab_counts`` emits per-doc (token, occurrences) pairs *scan-locally*
  (one Arrow-batched Counter pass — no (doc, token) shuffle), so the
  single exchange is keyed by token and carries pre-aggregated rows;
  Catalyst's partial hash-agg shrinks it further map-side.
- ``bigram_counts`` is the same shape over adjacent-token pairs (the
  count table a bigram LM / tokenizer merge step consumes).
- ``token_rarity`` joins per-doc token pairs with the vocab's doc
  frequencies (token-keyed shuffle join — AQE splits skewed hot-token
  partitions, which a token-partitioned window could not) and folds back
  per doc. Scores are exact integers (N // df buckets), so the oracle
  hash-compares.

All outputs integer/string only, aliased identically in the DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.session import tune_runtime


def _toks(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda t: F.length(t) > 0)


def _doc_token_occ(docs: DataFrame) -> DataFrame:
    """(doc_id, token, occ) — scan-local per-doc occurrence counts.

    One Arrow-batched Counter pass: O(total tokens) per row. Still emits
    one row per (doc, token) — NOT per instance — so the downstream
    exchange stays keyed and pre-aggregated. (The earlier pure-Catalyst
    form folded the array per DISTINCT token: O(distinct × total)
    interpreted lambda calls per row — ~30M at sf0.1, ~3 orders more work
    than the counting itself.)"""
    from collections import Counter
    from itertools import chain

    import pandas as pd

    def count(batches):
        for pdf in batches:
            ids, toks, occs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                c = Counter(w for w in (text or "").split(" ") if w)
                ids.append([doc_id] * len(c))
                toks.append(c.keys())
                occs.append(c.values())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(chain.from_iterable(ids), dtype="int64"),
                    "token": pd.Series(chain.from_iterable(toks), dtype=object),
                    "occ": pd.Series(chain.from_iterable(occs), dtype="int32"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        count, "doc_id long, token string, occ int"
    )


def vocab_counts(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """(token, tf, df): total occurrences and doc frequency per token,
    keeping tokens with tf ≥ ``min_count`` — the vocabulary table."""
    return (
        _doc_token_occ(docs)
        .groupBy("token")
        .agg(
            F.sum("occ").cast("long").alias("tf"),
            F.count("*").cast("long").alias("df"),
        )
        .where(F.col("tf") >= min_count)
    )


_VOCAB_SQL = """
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS token
  FROM documents
)
SELECT token, count(*)::BIGINT AS tf, count(DISTINCT doc_id)::BIGINT AS df
FROM t GROUP BY token HAVING count(*) >= 2
"""


def bigram_counts(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """(gram, cnt): corpus-wide adjacent-token bigram counts (LM/merge-step
    statistics). Scan-local bigram construction, token-keyed single shuffle."""
    toks = _toks()
    nb = F.size(toks) - 1
    bigrams = F.zip_with(
        F.slice(toks, 1, nb),
        F.slice(toks, 2, nb),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.where(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )


_BIGRAM_SQL = """
WITH t AS (
  SELECT list_filter(string_split(text,' '), x -> len(x) > 0) AS toks FROM documents
), b AS (
  SELECT toks[i] || ' ' || toks[i+1] AS gram
  FROM t, unnest(range(1, len(toks))) AS r(i)
  WHERE len(toks) >= 2
)
SELECT gram, count(*)::BIGINT AS cnt FROM b GROUP BY gram HAVING count(*) >= 2
"""


def token_rarity(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, rarity): rarity = Σ over token instances of
    (corpus_docs // token_df) — high when a doc is full of rare tokens.
    An integer-exact stand-in for mean token surprisal (quality filter)."""
    # df via groupBy + token-keyed join, NOT a count window over the token
    # partition: a window pins every instance of a hot token ("the" ≈ 60%
    # of docs) into ONE task — unsplittable skew at 100 TB — while AQE can
    # split a skewed join partition. The instance table is persisted so the
    # corpus scan + array fold runs once for both sides.
    n_docs = docs.agg(F.count("*").cast("long").alias("n_docs"))
    inst = _doc_token_occ(docs).persist()
    df_tbl = inst.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    return (
        inst.join(df_tbl, "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("int").alias("n_tokens"),
            F.sum(
                F.col("occ") * F.floor(F.col("n_docs") / F.col("df")).cast("long")
            ).cast("long").alias("rarity"),
        )
    )


_RARITY_SQL = """
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS token
  FROM documents
), dfs AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents)
SELECT t.doc_id,
  count(*)::INTEGER AS n_tokens,
  sum(n.n_docs // dfs.df)::BIGINT AS rarity
FROM t JOIN dfs USING (token) CROSS JOIN n
GROUP BY t.doc_id
"""


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_runtime(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def queries():
    return {
        "vocab_counts": lambda s, d: vocab_counts(_docs(s, d)),
        "vocab_bigram_counts": lambda s, d: bigram_counts(_docs(s, d)),
        "vocab_token_rarity": lambda s, d: token_rarity(_docs(s, d)),
    }


def oracle_sql():
    return {
        "vocab_counts": _VOCAB_SQL,
        "vocab_bigram_counts": _BIGRAM_SQL,
        "vocab_token_rarity": _RARITY_SQL,
    }
