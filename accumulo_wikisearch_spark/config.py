"""Engine configuration.

Mirrors the reference's tunables:
- ``num_partitions`` — shard count; reference default 25 via
  ``WikipediaConfiguration.java:118-120``; partition = id % num_partitions
  (``WikipediaMapper.java:114-117``).
- ``uid_max`` — posting-list degradation threshold; above this many distinct
  docs per (term, field, partition) the global index stores only a count
  (``GlobalIndexUidCombiner.java:40`` MAX=20).
- ``indexed_fields`` — which fields get fi/global-index entries; the
  reference records this in the metadata table (``WikipediaMapper.java:199-208``)
  and the planner consults it (``AbstractQueryLogic.findIndexedTerms``).
- ``unevaluated_fields`` — fields trusted from the index and skipped during
  event-side re-evaluation (``Query.java:245`` sets TEXT).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    num_partitions: int = 8
    # Two-tier degradation threshold (GlobalIndexUidCombiner.java:40 uses
    # MAX=20, sized for Accumulo cell economics). A parquet uid array of 64
    # longs is ~1 KB per posting row — negligible — and widens the exact
    # tier so rare-to-mid terms resolve via the driver doc-range path
    # (see exact_uid_total_max) instead of a field_index scan. Semantics
    # are identical to the reference at any value of uid_max.
    uid_max: int = 64
    # None → every field is indexed (our default corpus indexes everything).
    indexed_fields: frozenset[str] | None = None
    unevaluated_fields: frozenset[str] = field(default_factory=frozenset)
    # Broadcast a postings side when its estimated cardinality (from the
    # global index) is below this — the Spark analogue of the reference's
    # doc-range vs whole-partition-range two-tier plan
    # (RangeCalculator.java:683-705).
    broadcast_postings_max: int = 200_000
    # Ceiling on posting rows materialized driver-side from the global
    # index's exact-uid tier (GlobalIndexUidCombiner ≤ uid_max uids per
    # (term, field, partition, language) row). Below this, a rare term's
    # candidates come straight from the already-collected uid lists —
    # no field_index scan, and an all-rare-term query collapses to one
    # pruned filter on docs_wide (RangeCalculator.java:683-705 turning
    # posting lists into doc ranges). The cap bounds driver memory and
    # IN-list size at high partition counts.
    exact_uid_total_max: int = 4096
    normalizer: str = "LcNoDiacritics"
    # TEXT tokenizer: "word" (default) — punctuation-aware letters+digits
    # runs, the reference's Lucene WikipediaTokenizer intent
    # (WikipediaMapper.java:154-167): "abacus," and "abacus." index as the
    # token "abacus". "whitespace" is the compat mode (split on whitespace
    # runs only). On the all-lowercase-alnum synthetic corpus the two are
    # identical, so the DuckDB oracles hold under either. "wiki" adds
    # markup awareness for REAL dump text: [[link|label]]/{{template}}
    # syntax is stripped before word splitting (normalize.
    # strip_wiki_markup_col) — opt-in because the synthetic corpus has no
    # markup and the oracles replay the "word" semantics.
    tokenizer: str = "word"

    def is_indexed(self, fld: str) -> bool:
        return self.indexed_fields is None or fld in self.indexed_fields
