"""End-to-end training-data pipeline composition — docs/PIPELINE.md as an
executable, driver-verified fact.

Stages (each an already-verified operator; this entry checks their
COMPOSITION): quality filter → exact dedup (canonical per content group)
→ near-dup components via the banded MinHash scale path → decontaminate
(eval-shingle overlap) → per-domain cap → epoch-weighted mixture →
fixed-budget sequence packing → hash-deterministic shards with a
checksummed manifest.

The driver entry returns the final shard manifest; the oracle recomputes
the ENTIRE flow from the raw ``documents`` table in SQL (near-dup edges
via the exact n-gram verifier — equal to the banded MinHash path at check
scale, the same equivalence ``dedup_cluster_components`` proves) and must
reproduce the manifest bit-for-bit: a dropped row, a misrouted shard, a
wrong copy count, or a shifted packing offset all change a checksum.

Scale shape: every stage is a scan-local map, ONE bounded-key shuffle, or
a broadcast join (see docs/PIPELINE.md §"Why this holds at 100 TB");
composing them adds no new shuffle beyond each stage's own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.functions.normalize import HASH60_DUCKDB
from accumulo_wikisearch_spark.operators import curation, dedup, sampling, textstats
from accumulo_wikisearch_spark.session import tune_runtime

_CAP = 20
_BUDGET = 2048
_N_SHARDS = 8


def pipeline_e2e(
    docs: DataFrame,
    path: str,
    max_per_domain: int = _CAP,
    budget: int = _BUDGET,
    n_shards: int = _N_SHARDS,
) -> list[dict]:
    """Run the full curation → delivery flow and export checksummed
    training shards; returns the manifest (shard, n_docs, checksum)."""

    def barrier(df: DataFrame) -> DataFrame:
        """Truncate lineage between stages. Without it, each stage's
        logical plan embeds every upstream stage's full tree (the minhash
        kernels, the component loop, the shingle joins …), and
        DRIVER-SIDE ANALYSIS — not execution — comes to dominate:
        measured 68 s for the domain-cap stage over 500 rows before the
        barriers, ~1 s after. ``localCheckpoint`` materializes to
        executor-local storage (eager); a long-lived production run on a
        preemptible cluster would use reliable ``checkpoint()`` instead —
        same plan truncation, durable storage."""
        return df.localCheckpoint()

    # 1. quality filter (Gopher-ish heuristics, scan-local)
    q = textstats.text_quality(docs).where(F.col("keep") == 1).select("doc_id")
    kept = docs.join(q, "doc_id", "left_semi")
    # 2. exact dedup — canonical doc per content hash
    canon = barrier(
        kept.join(
            curation.canonical_docs(kept).select(
                F.col("canonical_id").alias("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
    )
    # 3. near-dup components via the banded MinHash SCALE path (the
    #    production default of dedup_clusters); min-id doc of each
    #    component survives
    comp = dedup.connected_components(dedup.minhash_lsh_pairs(canon))
    drop = comp.where(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    surv = barrier(canon.join(drop, "doc_id", "left_anti"))
    # 4. decontaminate: eval slice = surviving doc_id % 97 == 0; training
    #    docs sharing any 5-token shingle with it are dropped. The BLOOM
    #    prefilter path is the production (100 TB) default — answer-
    #    identical to the exact path by construction (sketch-then-verify:
    #    false positives re-checked, false negatives impossible), so the
    #    oracle below is unchanged; at scale it replaces the broadcast
    #    shingle hash set with a literal bitset probed inside codegen.
    dec = curation.decontaminate_bloom(surv)
    clean = barrier(
        surv.join(
            dec.where(F.col("contaminated") == 0).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    )
    # 5. per-domain cap (lowest doc_ids win)
    capped = barrier(curation.domain_cap(clean, max_per_domain=max_per_domain))
    # 6. epoch-weighted mixture → (doc_id, domain, copy)
    mix = sampling.domain_mixture(capped, "source", sampling._MIX_WEIGHTS)
    # 7. pack the mixed copies into fixed-token-budget sequences per
    #    domain; mid = doc_id*4 + copy is the copy's identity (copies < 4
    #    by construction: max weight 250 → ≤ 3 copies)
    n = F.size(curation._toks()).cast("long")
    mixed = mix.join(docs.select("doc_id", "text"), "doc_id").select(
        (F.col("doc_id") * 4 + F.col("copy")).alias("mid"),
        "domain",
        n.alias("n_tokens"),
    )
    w = Window.partitionBy("domain").orderBy("mid")
    packed = mixed.select(
        "mid",
        "domain",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget)
        .cast("long")
        .alias("seq_id"),
    )
    # 8. shard delivery keyed on the packed identity (mid:seq_id), so the
    #    manifest checksums cover the packing assignment too
    rows = packed.select(
        F.concat_ws(":", F.col("mid"), F.col("seq_id")).alias("mid_seq")
    )
    return sampling.write_training_shards(
        rows, path, n_shards=n_shards, key="mid_seq"
    )


# pipeline output cache per sf_dir (immutable once computed, like the
# written-shard cache in sampling.py)
_PIPELINES: dict = {}


def _pipeline_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    tune_runtime(spark)
    manifest = _PIPELINES.get(sf_dir)
    if manifest is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        path = tempfile.mkdtemp(prefix="wikisearch-pipeline-")
        manifest = _PIPELINES[sf_dir] = pipeline_e2e(docs, path)
    return spark.createDataFrame(
        [(m["shard"], m["n_docs"], m["checksum"]) for m in manifest],
        "shard int, n_docs bigint, checksum bigint",
    )


def _pipeline_sql(
    max_per_domain: int = _CAP, budget: int = _BUDGET, n_shards: int = _N_SHARDS
) -> str:
    """The whole flow re-derived from the raw table (quality + exact dedup
    + n-gram-Jaccard components exactly as cur_keep_list's oracle, then
    decontaminate / cap / mixture / pack / shard arithmetic)."""
    mix_pct = str(100)
    for value, p in sorted(sampling._MIX_WEIGHTS.items()):
        mix_pct = f"CASE WHEN source = '{value}' THEN {p} ELSE {mix_pct} END"
    mix_bucket = sampling.hash_bucket_duckdb("doc_id", "mix")
    shard_h = HASH60_DUCKDB.format(expr="concat('shard', mid_seq)")
    key_h = HASH60_DUCKDB.format(expr="mid_seq")
    return f"""
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
dropped AS (SELECT node FROM clusters WHERE node <> comp),
surv AS (
  SELECT doc_id FROM cd WHERE doc_id NOT IN (SELECT node FROM dropped)
),
st AS (
  SELECT t.doc_id, t.toks FROM t JOIN surv USING (doc_id)
),
ssh AS (
  SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS s
  FROM st, unnest(range(1, len(toks) - 3)) AS r(i)
  WHERE len(toks) >= 5
),
hit AS (
  SELECT DISTINCT a.doc_id
  FROM ssh a WHERE a.doc_id % 97 <> 0
    AND a.s IN (SELECT s FROM ssh WHERE doc_id % 97 = 0)
),
clean AS (
  SELECT doc_id FROM surv
  WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
),
capped AS (
  SELECT doc_id, source FROM (
    SELECT d.doc_id, d.source,
      row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
    FROM documents d JOIN clean USING (doc_id)
  ) WHERE rn <= {max_per_domain}
),
mixw AS (
  SELECT doc_id, source AS domain,
    ({mix_pct}) // {sampling.BUCKETS}
      + CASE WHEN {mix_bucket} < ({mix_pct}) % {sampling.BUCKETS} THEN 1 ELSE 0 END AS n
  FROM capped
),
mix AS (
  SELECT doc_id, domain, u.copy FROM mixw, unnest(range(0, n)) AS u(copy)
),
mx AS (
  SELECT (mix.doc_id * 4 + mix.copy) AS mid, mix.domain,
         len(t.toks)::BIGINT AS n_tokens
  FROM mix JOIN t ON t.doc_id = mix.doc_id
),
packed AS (
  SELECT mid, domain,
    ((sum(n_tokens) OVER (PARTITION BY domain ORDER BY mid) - n_tokens) // {budget})::BIGINT AS seq_id
  FROM mx
),
keys AS (
  SELECT mid::VARCHAR || ':' || seq_id::VARCHAR AS mid_seq FROM packed
)
SELECT ({shard_h} % {n_shards})::INTEGER AS shard,
  count(*)::BIGINT AS n_docs,
  bit_xor({key_h})::BIGINT AS checksum
FROM keys GROUP BY 1
"""


def queries():
    return {"pipeline_e2e": _pipeline_entry}


def oracle_sql():
    return {"pipeline_e2e": _pipeline_sql()}
