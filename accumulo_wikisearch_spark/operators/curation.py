"""Training-data curation operators: document chunking, benchmark
decontamination, Gopher-style repetition filtering, and canonical-document
selection after exact dedup.

These extend the reference surface (SURVEY.md §2.6) with the corpus-prep
steps an LLM pretraining pipeline runs at 100 TB:

- ``chunk_documents`` — fixed-size token windows with stride (the unit a
  tokenizer/packer consumes). Scan-local: explode of a per-row sequence,
  no shuffle at all — linear over the corpus.
- ``decontaminate`` — flag training docs that share any k-token shingle
  with a (small) held-out eval set. The eval shingle set is broadcast, so
  the 100 TB training side never shuffles: one scan + broadcast-hash
  left-semi probe.
- ``repetition_stats`` — top-bigram fraction (the Gopher repetition
  heuristic); all built-in array expressions inside whole-stage codegen.
- ``canonical_docs`` — one surviving doc per exact-content group
  (min doc id), i.e. the keep-list exact dedup feeds downstream. One
  hash-partitioned groupBy with map-side partial aggregation.

All outputs are integer/string-valued and aliased to match the DuckDB
oracles below (driver hash-compare contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import HASH60_DUCKDB, hash60_col
from accumulo_wikisearch_spark.session import tune_runtime


def _toks(col: str = "text"):
    return F.filter(F.split(F.col(col), " "), lambda t: F.length(t) > 0)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def chunk_documents(docs: DataFrame, size: int = 64, stride: int = 48) -> DataFrame:
    """Split each doc into token windows of ``size`` every ``stride`` tokens.

    Returns (doc_id, chunk_id, n_tokens, chunk_hash) — one row per window;
    the last window may be short. ``chunk_hash`` is the portable 60-bit hash
    of the space-joined window (so downstream exact chunk-dedup is a plain
    groupBy on it).
    """
    toks = _toks()
    n = F.size(toks)
    # last start is capped at n - size + stride: a window whose tokens are
    # all inside the previous window would be redundant output. Explicit
    # positive step: sequence(1, 0) would infer a NEGATIVE step, so empty
    # docs are filtered out rather than passed to sequence.
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - size + stride), F.lit(stride)
    )
    rows = docs.where(n >= 1).select(
        "doc_id", toks.alias("toks"), F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice(F.col("toks"), F.col("start"), size)
    return rows.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        hash60_col(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def _chunk_sql(size: int = 64, stride: int = 48) -> str:
    """Replay of chunk_documents at any (size, stride): last start is
    capped at len - size + stride; toks[start:start+size-1] is DuckDB's
    inclusive-bound slice of ``size`` tokens."""
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
    unnest(range(1, greatest(1, len(toks) - {size - stride}) + 1, {stride})) AS start
  FROM t WHERE len(toks) >= 1
)
SELECT doc_id,
  ((start - 1) // {stride})::INTEGER AS chunk_id,
  len(toks[start:start+{size - 1}])::INTEGER AS n_tokens,
  {HASH60_DUCKDB.format(expr=f"array_to_string(toks[start:start+{size - 1}], ' ')")} AS chunk_hash
FROM s
"""


_CHUNK_SQL = _chunk_sql()


def chunk_dedup(docs: DataFrame, size: int = 64, stride: int = 48) -> DataFrame:
    """Paragraph/chunk-level exact dedup (the C4 construction deduplicates
    three-sentence spans; here the unit is :func:`chunk_documents`'s token
    window): among chunks with identical text, keep the first occurrence in
    (doc_id, chunk_id) order and drop the rest. Output:
    (doc_id, chunk_id, keep) for every chunk.

    One shuffle on the 8-byte chunk hash; the min-occurrence window is the
    same shape as exact_duplicates' canonical pick."""
    from pyspark.sql import Window

    ch = chunk_documents(docs, size, stride)
    w = Window.partitionBy("chunk_hash")
    first = F.min(F.struct("doc_id", "chunk_id")).over(w)
    return ch.select(
        "doc_id",
        "chunk_id",
        (
            (F.col("doc_id") == first["doc_id"])
            & (F.col("chunk_id") == first["chunk_id"])
        )
        .cast("int")
        .alias("keep"),
    )


_CHUNK_DEDUP_SQL = f"""
WITH ch AS ({_CHUNK_SQL})
SELECT doc_id, chunk_id,
  (CASE WHEN row_number() OVER (
     PARTITION BY chunk_hash ORDER BY doc_id, chunk_id) = 1
   THEN 1 ELSE 0 END)::INTEGER AS keep
FROM ch
"""


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def _shingle_rows(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, sh) — every k-token space-joined shingle of every doc."""
    toks = _toks()
    n = F.size(toks)
    rows = docs.where(n >= k).select("doc_id", toks.alias("toks"))
    sh = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (k - 1)),
            lambda i: F.array_join(F.slice("toks", i, k), " "),
        )
    )
    return rows.select("doc_id", sh.alias("sh"))


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame | None = None, k: int = 5, modulus: int = 97
) -> DataFrame:
    """Flag training docs sharing any k-token shingle with the eval set.

    ``eval_docs`` defaults to ``doc_id % modulus == 0`` (a deterministic
    held-out slice of the corpus, standing in for a benchmark suite).
    Returns (doc_id, contaminated) over the TRAINING docs only.

    Scale shape: the eval set is tiny relative to training data, so its
    distinct shingles are broadcast; the training side is one scan + a
    broadcast left-semi probe (no shuffle of the 100 TB side). The final
    flag join is doc_id-keyed against an already-small hit list, also
    broadcast.
    """
    if eval_docs is None:
        eval_docs = docs.where(F.col("doc_id") % modulus == 0)
        train = docs.where(F.col("doc_id") % modulus != 0)
    else:
        train = docs.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    eval_sh = _shingle_rows(eval_docs, k).select("sh").distinct()
    hits = (
        _shingle_rows(train, k)
        .join(F.broadcast(eval_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return train.select("doc_id").join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id", F.coalesce("contaminated", F.lit(0)).cast("int").alias("contaminated")
    )


def decontaminate_bloom(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    k: int = 5,
    modulus: int = 97,
    n_words: int = 64,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom prefilter — SAME final answer
    (the oracle is literally the exact path's SQL), different 100 TB cost.

    At scale the eval-suite shingle set can run to 10⁸+ strings — too big
    to broadcast as a hash set. Its Bloom bitset is KBs-to-MBs, collected
    to the driver (bounded: ≤ ``n_words`` rows by construction) and
    compiled into a LITERAL bit-test expression, so the 100 TB training
    scan probes membership entirely inside whole-stage codegen: no UDF,
    no join, no shuffle. Bloom false positives (deterministic, ~4% at the
    default sizing) only cost a second look — the surviving candidates
    still go through the exact broadcast semi-join, so no false flag can
    reach the output; false negatives don't exist, so no contamination
    escapes. The classic sketch-then-verify contract."""
    from accumulo_wikisearch_spark.operators.sketches import (
        _bloom_positions,
        bitset_test,
        bloom_build,
    )

    bits_per_word = 60
    m = n_words * bits_per_word
    if eval_docs is None:
        eval_docs = docs.where(F.col("doc_id") % modulus == 0)
        train = docs.where(F.col("doc_id") % modulus != 0)
    else:
        train = docs.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    eval_sh = _shingle_rows(eval_docs, k).select("sh").distinct()
    bloom = bloom_build(
        eval_sh.select(hash60_col("sh").alias("key")), "key", n_words=n_words
    )
    words = {r["word"]: r["bits"] for r in bloom.collect()}  # ≤ n_words rows
    bitset_words = [int(words.get(w, 0)) for w in range(n_words)]
    key = hash60_col(F.col("sh"))
    member = F.lit(True)
    for pos in _bloom_positions(key, m, 3):
        member = member & bitset_test(bitset_words, pos)
    candidates = _shingle_rows(train, k).where(member)
    hits = (
        candidates.join(F.broadcast(eval_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(1))
    )
    return train.select("doc_id").join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id", F.coalesce("contaminated", F.lit(0)).cast("int").alias("contaminated")
    )


_DECONTAM_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS s
  FROM t, unnest(range(1, len(toks) - 3)) AS r(i)
  WHERE len(toks) >= 5
), hit AS (
  SELECT DISTINCT a.doc_id
  FROM sh a WHERE a.doc_id % 97 <> 0
    AND a.s IN (SELECT s FROM sh WHERE doc_id % 97 = 0)
)
SELECT d.doc_id,
  (d.doc_id IN (SELECT doc_id FROM hit))::INTEGER AS contaminated
FROM documents d WHERE d.doc_id % 97 <> 0
"""


# ---------------------------------------------------------------------------
# repetition (Gopher-style)
# ---------------------------------------------------------------------------


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Top-bigram multiplicity per doc (repetition heuristic à la Gopher).

    Returns (doc_id, n_bigrams, top_bigram_cnt, repetitive) for docs with
    ≥2 tokens; ``repetitive`` = top bigram covers ≥20% of all bigrams
    (integer cross-multiplication — no floats). Entirely scan-local: the
    max multiplicity is a run-length fold over the doc's own sorted bigram
    array, not a cross-doc aggregation.
    """
    toks = _toks()
    n = F.size(toks)
    rows = docs.where(n >= 2).select("doc_id", toks.alias("toks"))
    nb = F.size("toks") - 1
    bigrams = F.zip_with(
        F.slice("toks", 1, nb),
        F.slice("toks", 2, nb),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    top = F.aggregate(
        F.array_sort(bigrams),
        zero,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return rows.select(
        "doc_id",
        nb.cast("int").alias("n_bigrams"),
        top.cast("int").alias("top_bigram_cnt"),
        (top * 10 >= nb * 2).cast("int").alias("repetitive"),
    )


_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS toks
  FROM documents
), b AS (
  SELECT doc_id, len(toks) - 1 AS n_bigrams, toks[i] || ' ' || toks[i+1] AS g
  FROM t, unnest(range(1, len(toks))) AS r(i)
  WHERE len(toks) >= 2
), c AS (
  SELECT doc_id, n_bigrams, g, count(*) AS cnt FROM b GROUP BY 1, 2, 3
)
SELECT doc_id,
  n_bigrams::INTEGER AS n_bigrams,
  max(cnt)::INTEGER AS top_bigram_cnt,
  (max(cnt) * 10 >= n_bigrams * 2)::INTEGER AS repetitive
FROM c GROUP BY doc_id, n_bigrams
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# patterns chosen from the Java-regex ∩ RE2 common subset so Spark and the
# DuckDB oracle compile them identically
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_LONGNUM_RE = "[0-9]{6,}"


def redact_text(docs: DataFrame) -> DataFrame:
    """Scrub emails and long digit runs (ids/phones) before training.

    (doc_id, n_emails, n_longnums, redacted_hash) — counts of each PII
    class plus the hash of the scrubbed text (so a changed redaction shows
    up as a changed hash). Pure regexp built-ins inside codegen: scan-local,
    zero shuffle — the shape of a 100 TB scrub pass.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_LONGNUM_RE)).cast("int").alias("n_longnums"),
        hash60_col(redacted).alias("redacted_hash"),
    )


_REDACT_SQL = f"""
WITH r AS (
  SELECT doc_id, text,
    regexp_replace(
      regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
      '{_LONGNUM_RE}', '<NUM>', 'g') AS redacted
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '{_EMAIL_RE}'))::INTEGER AS n_emails,
  len(regexp_extract_all(text, '{_LONGNUM_RE}'))::INTEGER AS n_longnums,
  {HASH60_DUCKDB.format(expr="redacted")} AS redacted_hash
FROM r
"""


# ---------------------------------------------------------------------------
# canonical selection
# ---------------------------------------------------------------------------


def canonical_docs(docs: DataFrame) -> DataFrame:
    """One surviving doc per exact-content group: (canonical_id, n_members).

    The keep-list exact dedup feeds a downstream pipeline; canonical = min
    doc id of the group (deterministic). One groupBy on the content hash —
    partial (map-side) aggregation does the heavy lifting before the
    shuffle, so the exchange carries one row per distinct text.
    """
    return (
        docs.groupBy(hash60_col("text").alias("h"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select("canonical_id", "n_members")
    )


_CANONICAL_SQL = f"""
SELECT min(doc_id) AS canonical_id, count(*)::BIGINT AS n_members
FROM documents GROUP BY {HASH60_DUCKDB.format(expr="text")}
"""


# ---------------------------------------------------------------------------
# end-to-end keep list
# ---------------------------------------------------------------------------


def keep_list(docs: DataFrame) -> DataFrame:
    """The composed curation pipeline: quality filter → exact dedup
    (canonical per content group) → near-dup clustering (n-gram Jaccard ≥
    0.8, keep the min doc of each component) → surviving doc ids.

    Each stage consumes the previous stage's (shrinking) survivor set, so
    the expensive pair generation runs only over quality-passing canonical
    docs. Stages are the already-verified operators ``text_quality``,
    ``canonical_docs``, ``ngram_jaccard_pairs`` and
    ``connected_components`` — this entry checks their composition.
    """
    from accumulo_wikisearch_spark.operators import dedup, textstats

    q = textstats.text_quality(docs).where(F.col("keep") == 1).select("doc_id")
    kept = docs.join(q, "doc_id", "left_semi")
    canon = kept.join(
        canonical_docs(kept).select(F.col("canonical_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    comp = dedup.connected_components(dedup.ngram_jaccard_pairs(canon))
    drop = comp.where(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    return canon.join(drop, "doc_id", "left_anti").select("doc_id")


_KEEP_SQL = """
WITH RECURSIVE
t AS (
  SELECT doc_id, text,
         list_filter(string_split(text,' '), x -> len(x) > 0) AS toks
  FROM documents
),
q AS (
  SELECT doc_id, text FROM t
  WHERE len(toks) >= 20
    AND 10 * len(list_distinct(toks)) >= 4 * len(toks)
    AND len(list_filter(toks, x -> x IN ('the','a','in','of'))) > 0
),
canon AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
cd AS (SELECT q.doc_id, q.text FROM q JOIN canon USING (doc_id)),
w AS (SELECT doc_id, string_split(text,' ') AS wl FROM cd),
sh AS (
  SELECT doc_id, unnest(list_distinct([wl[i]||' '||wl[i+1]||' '||wl[i+2] for i in range(1, len(wl)-1)])) AS shingle
  FROM w WHERE len(wl) >= 3
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM common
  JOIN cnt ca ON ca.doc_id = a_id
  JOIN cnt cb ON cb.doc_id = b_id
  WHERE 5 * common >= 4 * (ca.n + cb.n - common)
),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach(node, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
),
clusters AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
dropped AS (SELECT node FROM clusters WHERE node <> comp)
SELECT doc_id FROM cd WHERE doc_id NOT IN (SELECT node FROM dropped)
"""


# ---------------------------------------------------------------------------
# driver registry
# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame, budget: int = 2048, shard_col: str = "source"
) -> DataFrame:
    """Assign docs to fixed-token-budget training sequences: within each
    shard (``shard_col`` group), docs in doc_id order accumulate token
    counts, and a doc joins sequence ``floor(start_offset / budget)`` —
    contiguous deterministic packing, the unit a pretraining dataloader
    consumes. Output: (doc_id, shard, seq_id, start_offset, n_tokens).

    Scale shape: ONE window cumsum per shard partition (shuffle on the
    shard key only) — no global sort; shards pack independently, exactly
    how a 100 TB corpus is packed per input shard in practice. Docs longer
    than the budget still get a deterministic home (they straddle
    sequences; the dataloader's truncation policy is out of scope).
    Deterministic and fully SQL-replayable — no RNG, no floats."""
    n = F.size(_toks()).cast("long")
    w = Window.partitionBy(shard_col).orderBy("doc_id")
    start = (F.sum(n).over(w) - n).alias("start_offset")
    return (
        docs.where(F.size(_toks()) > 0)
        .select(
            "doc_id",
            F.col(shard_col).alias("shard"),
            n.alias("n_tokens"),
            start,
        )
        .select(
            "doc_id",
            "shard",
            (F.col("start_offset") / budget).cast("long").alias("seq_id"),
            "start_offset",
            "n_tokens",
        )
    )


_PACK_SQL = """
WITH t AS (
  SELECT doc_id, source AS shard,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
  FROM documents
  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
),
c AS (
  SELECT doc_id, shard, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens) AS start_offset
  FROM t
)
SELECT doc_id, shard, (start_offset // 2048)::BIGINT AS seq_id,
       start_offset::BIGINT AS start_offset, n_tokens
FROM c
"""


def domain_cap(
    docs: DataFrame, key: str = "source", max_per_domain: int = 20
) -> DataFrame:
    """Per-domain document cap — the source-balancing step of C4 /
    RefinedWeb-style curation: keep at most ``max_per_domain`` docs per
    domain (lowest doc_ids win, deterministic), so no single crawl host
    dominates the mixture. Output: (doc_id, <key>) of the survivors.

    Scale shape (skew-aware): a naive window over domain shuffles the
    WHOLE corpus and lands every mega-domain on one task. Instead the
    per-domain counts aggregate first (map-side partial → tiny result);
    only rows of OVER-CAP domains — selected by broadcast semi-join —
    enter the row_number window, while the under-cap remainder passes
    through with NO shuffle at all. Web corpora are long-tailed, so the
    windowed slice is a small fraction of the input."""
    hot = (
        docs.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_per_domain)
        .select(F.col(key).alias("_hotk"))
    )
    # null-safe membership: a NULL domain is still ONE domain and must be
    # capped like any other (plain semi/anti join keys never match null,
    # which would exempt the null group from the cap)
    is_hot = F.col(key).eqNullSafe(F.col("_hotk"))
    cold = docs.join(F.broadcast(hot), is_hot, "left_anti").select("doc_id", key)
    w = Window.partitionBy(key).orderBy("doc_id")
    capped = (
        docs.join(F.broadcast(hot), is_hot, "left_semi")
        .select("doc_id", key)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_per_domain)
        .drop("_rn")
    )
    return cold.unionByName(capped)


_DOMAIN_CAP_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 20
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_runtime(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def queries():
    return {
        "cur_chunk_documents": lambda s, d: chunk_documents(_docs(s, d)),
        "cur_decontaminate": lambda s, d: decontaminate(_docs(s, d)),
        "cur_decontaminate_bloom": lambda s, d: decontaminate_bloom(_docs(s, d)),
        "cur_repetition_stats": lambda s, d: repetition_stats(_docs(s, d)),
        "cur_canonical_docs": lambda s, d: canonical_docs(_docs(s, d)),
        "cur_redact_text": lambda s, d: redact_text(_docs(s, d)),
        "cur_keep_list": lambda s, d: keep_list(_docs(s, d)),
        "cur_pack_sequences": lambda s, d: pack_sequences(_docs(s, d)),
        "cur_chunk_dedup": lambda s, d: chunk_dedup(_docs(s, d)),
        "cur_domain_cap": lambda s, d: domain_cap(_docs(s, d)),
    }


def oracle_sql():
    return {
        "cur_chunk_documents": _CHUNK_SQL,
        "cur_decontaminate": _DECONTAM_SQL,
        # same SQL on purpose: the bloom prefilter must not change the answer
        "cur_decontaminate_bloom": _DECONTAM_SQL,
        "cur_repetition_stats": _REPETITION_SQL,
        "cur_canonical_docs": _CANONICAL_SQL,
        "cur_redact_text": _REDACT_SQL,
        "cur_keep_list": _KEEP_SQL,
        "cur_pack_sequences": _PACK_SQL,
        "cur_chunk_dedup": _CHUNK_DEDUP_SQL,
        "cur_domain_cap": _DOMAIN_CAP_SQL,
    }
