"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting — the per-document feature extraction a training-data
pipeline runs over 100 TB corpora.

All but lang-ID are pure built-in expressions (JVM codegen, scan-local, no
shuffle at all — linear map over the corpus). Lang-ID is a vectorized
pandas UDF (Arrow-batched) over character n-gram profiles.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from accumulo_wikisearch_spark.functions.normalize import HASH60_DUCKDB, hash60_col
from accumulo_wikisearch_spark.session import tune_runtime

STOPWORDS = ("the", "a", "in", "of")


def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc quality features, integer-valued for oracle stability:
    token counts, distinct ratio, stopword count, word lengths, and a
    composite keep/drop flag (the usual pretraining heuristics)."""
    # hoist the tokenizer into its own projection: each output column
    # embeds its own copy of every expression it references, so an
    # un-hoisted `toks` re-tokenizes per reference in the interpreted
    # HOF evaluator (the text_repetition r10 finding; CollapseProject
    # cannot inline a multiply-referenced non-trivial alias)
    toks_expr = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    tokenized = docs.select("doc_id", toks_expr.alias("toks"))
    toks = F.col("toks")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stopword_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    max_wlen = F.array_max(F.transform(toks, F.length))
    # keep: ≥20 tokens, ≥40% distinct, has a stopword (10× int arithmetic)
    keep = (
        (n_tokens >= 20)
        & (F.lit(10) * n_distinct >= F.lit(4) * n_tokens)
        & (stopword_cnt > 0)
    )
    return tokenized.select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        n_distinct.cast("int").alias("n_distinct"),
        stopword_cnt.cast("int").alias("stopword_cnt"),
        max_wlen.cast("int").alias("max_word_len"),
        keep.cast("int").alias("keep"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate counts regex token boundaries (word cores, digits,
    punctuation runs) plus a length/4 correction for long words — a
    deterministic, library-free approximation of BPE token counts.
    """
    # tokenizer hoisted once per row (see text_quality's note)
    toks_expr = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    tokenized = docs.select(
        "doc_id", F.length("text").alias("_nc"), toks_expr.alias("toks")
    )
    ws = F.size(F.col("toks"))
    # pieces: every word contributes ceil(len/4) subword units
    pieces = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return tokenized.select(
        "doc_id",
        ws.cast("int").alias("ws_tokens"),
        F.col("_nc").cast("int").alias("n_chars"),
        pieces.cast("int").alias("bpe_estimate"),
    )


def text_repetition(docs: DataFrame) -> DataFrame:
    """Within-doc repetition signal — the DUPLICATE-n-gram quality filter
    of Gopher (Rae et al., "Scaling Language Models: ... Gopher", 2021,
    table A1): for n ∈ {2,3,4}, how many of the doc's token n-grams are
    repeats of an earlier n-gram (total − distinct). Complements
    ``curation.repetition_stats`` (Gopher's OTHER repetition row — TOP
    n-gram multiplicity): a doc alternating two phrases has low top-bigram
    share but high duplicate fraction; both filters ship because the
    paper applies both. Repetitive docs (boilerplate, keyword stuffing,
    degenerate generations) score high.

    Integer-valued for oracle stability; ``keep`` applies the Gopher-like
    thresholds (dup fraction ≤ 0.20 / 0.18 / 0.16 for n = 2 / 3 / 4) via
    cross-multiplication — no floats. Scan-local: per-row work, NO
    explode, NO shuffle; at 100 TB this is a free rider on any corpus
    scan.

    Kernel choice (r10, measured at sf0.1 — full adjudication in
    docs/SCALE.md): this stays a JVM expression. An Arrow
    ``mapInPandas`` kernel was REJECTED by measurement — a no-op Python
    job alone floors at ~0.21 s single-partition / ~0.44 s at 32 tasks
    on this host (~13 ms/task serialized worker acquisition + fixed
    setup), which already exceeds the entire JVM query; the pure-Python
    n-gram kernel (0.18 s single-core for the whole sf0.1 table) cannot
    amortize that. Within the JVM, ``toks`` is hoisted into its own
    projection (one tokenize per row in the analyzed plan instead of
    one per referencing expression; CollapseProject cannot inline a
    multiply-referenced non-trivial alias) and grams build via
    ``concat_ws(element_at…)`` (no per-gram array slice) — in-session
    A/Bs put this at parity-to-modestly-better vs the r5 form (both
    floor ~0.22-0.28 s depending on session), i.e. the remaining cost
    is the interpreted HOF evaluator itself, not the formulation."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: F.length(t) > 0)
    tokenized = docs.select("doc_id", toks.alias("toks"))
    tk = F.col("toks")

    def gram_counts(n: int):
        g = F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        tot = F.size(g)
        dup = tot - F.size(F.array_distinct(g))
        return tot.cast("int"), dup.cast("int")

    tot2, dup2 = gram_counts(2)
    tot3, dup3 = gram_counts(3)
    tot4, dup4 = gram_counts(4)
    keep = (
        (F.lit(5) * dup2 <= tot2)  # ≤ 0.20
        & (F.lit(50) * dup3 <= F.lit(9) * tot3)  # ≤ 0.18
        & (F.lit(25) * dup4 <= F.lit(4) * tot4)  # ≤ 0.16
    )
    return tokenized.select(
        "doc_id",
        tot2.alias("tot2"),
        dup2.alias("dup2"),
        tot3.alias("tot3"),
        dup3.alias("dup3"),
        tot4.alias("tot4"),
        dup4.alias("dup4"),
        keep.cast("int").alias("keep"),
    )


def doc_fingerprint(docs: DataFrame, gram: int = 8) -> DataFrame:
    """Winnowing-style fingerprint: min portable-hash over all ``gram``-char
    windows of the text. Equal fingerprints ⇒ likely shared content.
    Scan-local (explode + min per doc, no cross-doc shuffle)."""
    n = F.length("text")
    idx = F.explode(F.sequence(F.lit(1), n - gram + 1)).alias("i")
    grams = docs.where(n >= gram).select("doc_id", idx, "text")
    grams = grams.select("doc_id", F.expr(f"substring(text, i, {gram})").alias("g"))
    return grams.groupBy("doc_id").agg(
        F.min(hash60_col("g")).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# language ID (n-gram heuristic, vectorized pandas UDF)
# ---------------------------------------------------------------------------

# Tiny trigram profiles per language — deterministic stand-ins; with a real
# multilingual corpus these would be learned frequency profiles.
_PROFILES = {
    "en": ["the", "ing", "and", " th", "ion"],
    "es": ["de ", "la ", "os ", "ión", "ent"],
    "de": ["der", "ein", "sch", "die", "und"],
    "fr": ["le ", "es ", "de ", "ent", "que"],
    "zh": ["的", "是", "了", "在", "有"],
}


_LANGID_UDF = None


def _get_langid_udf():
    # built lazily: pandas_udf registration needs an active SparkSession
    global _LANGID_UDF
    if _LANGID_UDF is None:

        @pandas_udf("string")
        def _langid_udf(texts: pd.Series) -> pd.Series:
            def classify(t: str) -> str:
                if not t:
                    return "und"
                best, best_score = "und", 0
                for lang, grams in _PROFILES.items():
                    score = sum(t.count(g) for g in grams)
                    if score > best_score:
                        best, best_score = lang, score
                return best

            return texts.map(classify)

        _LANGID_UDF = _langid_udf
    return _LANGID_UDF


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — char-n-gram language guess (Arrow-batched)."""
    return docs.select("doc_id", _get_langid_udf()(F.col("text")).alias("pred_lang"))


def hashing_embed(docs: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic document embeddings via the feature-hashing trick
    (Weinberger et al., "Feature hashing for large scale multitask
    learning", ICML 2009): each token instance adds ±1 to bucket
    hash60(token) % dim, sign from an independent hash bit. This is the
    EMBEDDING-GENERATION stage of the pipeline — its output feeds the ANN /
    embedding-dedup operators — kept model-free and integer-exact (a real
    encoder slots into the same (doc_id, vector) shape via mapInPandas,
    like the multimodal codecs).

    Output: (doc_id, emb_csv) — the dense int vector as a comma-joined
    string (the driver canonicalizer cannot hash array cells; same
    convention as quantize_int8.q_csv).

    Scale shape: one shuffle on (doc_id, bucket) with map-side partial
    sums (the same exchange vocab statistics use), then a per-doc dense
    fill from a map literal — no Python anywhere."""
    toks = F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 0)
    inst = docs.select("doc_id", F.explode(toks).alias("token")).select(
        "doc_id", hash60_col(F.col("token")).alias("h")
    )
    per_bucket = (
        inst.select(
            "doc_id",
            (F.col("h") % dim).cast("int").alias("bucket"),
            # shiftright, NOT h/256: float division rounds a 60-bit hash
            ((F.shiftright(F.col("h"), 8) % 2) * 2 - 1).cast("long").alias("sign"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("s"))
    )
    dense = (
        per_bucket.groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "s"))).alias("m"))
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("long")
                    ).cast("string"),
                ),
                ",",
            ).alias("emb_csv"),
        )
    )
    return dense


def _hash_embed_sql(dim: int = 64) -> str:
    h = HASH60_DUCKDB.format(expr="token")
    return f"""
WITH t AS (
  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS token
  FROM documents
),
i AS (
  SELECT doc_id, ({h}) % {dim} AS bucket,
         ((({h}) // 256) % 2) * 2 - 1 AS sign
  FROM t
),
pb AS (SELECT doc_id, bucket, sum(sign) AS s FROM i GROUP BY doc_id, bucket),
d AS (
  SELECT pb.doc_id, u.b, COALESCE(max(pb.s) FILTER (WHERE pb.bucket = u.b), 0) AS v
  FROM pb, unnest(range(0, {dim})) AS u(b)
  GROUP BY pb.doc_id, u.b
)
SELECT doc_id, array_to_string(list(v::VARCHAR ORDER BY b), ',') AS emb_csv
FROM d GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_runtime(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def queries():
    return {
        "text_quality": lambda s, d: text_quality(_docs(s, d)),
        "text_repetition": lambda s, d: text_repetition(_docs(s, d)),
        "token_counts": lambda s, d: token_counts(_docs(s, d)),
        "doc_fingerprint": lambda s, d: doc_fingerprint(_docs(s, d)),
        # heuristic, no SQL oracle (rows-only)
        "lang_id": lambda s, d: lang_id(_docs(s, d)),
        "text_embed_hashing": lambda s, d: hashing_embed(_docs(s, d)),
    }


_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks FROM documents
)
SELECT doc_id,
  len(toks)::INTEGER AS n_tokens,
  len(list_distinct(toks))::INTEGER AS n_distinct,
  len(list_filter(toks, x -> x IN ('the','a','in','of')))::INTEGER AS stopword_cnt,
  list_max(list_transform(toks, x -> len(x)))::INTEGER AS max_word_len,
  (len(toks) >= 20
   AND 10 * len(list_distinct(toks)) >= 4 * len(toks)
   AND len(list_filter(toks, x -> x IN ('the','a','in','of'))) > 0)::INTEGER AS keep
FROM t
"""

def _rep_sql() -> str:
    """Twin of text_repetition: list_slice bounds are inclusive in DuckDB,
    so the n-gram at position i is list_slice(toks, i, i + n - 1)."""

    def counts(n: int) -> tuple[str, str]:
        g = (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_transform(range(1, len(toks) - {n - 2}), "
            f"i -> array_to_string(list_slice(toks, i, i + {n - 1}), ' ')) "
            f"ELSE [] END"
        )
        return f"len({g})", f"len({g}) - len(list_distinct({g}))"

    t2, d2 = counts(2)
    t3, d3 = counts(3)
    t4, d4 = counts(4)
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks FROM documents
)
SELECT doc_id,
  ({t2})::INTEGER AS tot2, ({d2})::INTEGER AS dup2,
  ({t3})::INTEGER AS tot3, ({d3})::INTEGER AS dup3,
  ({t4})::INTEGER AS tot4, ({d4})::INTEGER AS dup4,
  (5 * ({d2}) <= ({t2})
   AND 50 * ({d3}) <= 9 * ({t3})
   AND 25 * ({d4}) <= 4 * ({t4}))::INTEGER AS keep
FROM t
"""


_TOKEN_SQL = """
WITH t AS (
  SELECT doc_id, text, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks FROM documents
)
SELECT doc_id,
  len(toks)::INTEGER AS ws_tokens,
  len(text)::INTEGER AS n_chars,
  list_sum(list_transform(toks, x -> ceil(len(x) / 4.0)::BIGINT))::INTEGER AS bpe_estimate
FROM t
"""

_FP_SQL = f"""
WITH g AS (
  SELECT doc_id, text, unnest(range(1, len(text) - 6)) AS i
  FROM documents WHERE len(text) >= 8
)
SELECT doc_id, min({HASH60_DUCKDB.format(expr='substr(text, i, 8)')}) AS fingerprint
FROM g GROUP BY doc_id
"""


def _langid_sql() -> str:
    # Exact SQL twin of the UDF heuristic, generated from the same _PROFILES
    # so they cannot drift: non-overlapping substring counts via the
    # replace() trick, argmax with first-language-wins tie-break (the UDF's
    # strict `score > best` over dict order), all-zero → 'und'.
    scores = {
        lang: " + ".join(
            f"(len(t) - len(replace(t, '{g}', ''))) // {len(g)}" for g in grams
        )
        for lang, grams in _PROFILES.items()
    }
    score_cols = ",\n    ".join(f"({e}) AS s_{lang}" for lang, e in scores.items())
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in _PROFILES) + ")"
    branches = "\n    ".join(
        f"WHEN s_{lang} = {m} THEN '{lang}'" for lang in _PROFILES
    )
    return f"""
WITH s AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), sc AS (
  SELECT doc_id,
    {score_cols}
  FROM s
)
SELECT doc_id, CASE
    WHEN {m} = 0 THEN 'und'
    {branches}
  END AS pred_lang
FROM sc
"""


def oracle_sql():
    return {
        "text_quality": _QUALITY_SQL,
        "text_repetition": _rep_sql(),
        "token_counts": _TOKEN_SQL,
        "doc_fingerprint": _FP_SQL,
        "lang_id": _langid_sql(),
        "text_embed_hashing": _hash_embed_sql(),
    }
