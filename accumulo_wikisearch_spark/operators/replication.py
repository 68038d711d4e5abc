"""Catalog replication: bootstrap clone + O(batch) delta shipping.

The cross-cluster story an LSM store needs (Accumulo deployments lean on
table clone + replication for exactly this; the reference's corpus is
served from one cluster, but its operational model assumes replicas):

- :func:`clone_catalog` — bootstrap a replica from the source's CURRENT
  base generation with the engine's own writer (one full distributed
  rewrite, layout re-derived — honest: a bootstrap IS O(catalog)). A
  ``_REPLICA.json`` marker records which source version the base
  includes, so later shipping knows exactly which batches the clone
  already contains.
- :func:`replicate_deltas` — ship published batch dirs the replica does
  not yet have: per-table distributed parquet copy into the replica's
  hidden staging name, then the SAME atomic publish rename and the SAME
  batch id as the source. O(new batches), never O(catalog); idempotent
  (re-runs skip existing ids); restart-safe (a crash leaves only a
  hidden staged dir that the replica's next compaction sweeps).

The replica is a NORMAL catalog afterwards: merge-read queryable while
batches are pending, compactable on its own cadence, time-travelable,
and CDC-tailable onward — replication composes with every other
lifecycle feature instead of being a parallel mechanism.

Falling behind: a batch folded at the source stays on disk until its
folding manifest retires (``retain_generations`` rewrites later), so a
replica that syncs at least once per source retention window never
misses one. Past that, the batch's files are gone and
:func:`replicate_deltas` raises a re-clone error instead of silently
serving a hole.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    _ALL_TABLES,
    _STAGED_PREFIX,
    _fs,
    _publish_delta,
    delta_batches,
    raw_delta_names,
)

_REPLICA_MARKER = "_REPLICA.json"


def clone_catalog(
    spark: SparkSession,
    src: str,
    dst: str,
    config: EngineConfig | None = None,
    preserve_layout: bool = True,
) -> dict:
    """Bootstrap ``dst`` as a replica of ``src``'s current BASE
    generation (pending deltas are NOT folded in — they ship as batches
    via :func:`replicate_deltas`, keeping the clone/ship split exact).

    One full distributed rewrite through the engine's own writer: the
    replica gets the same partition/sort (and, with ``preserve_layout``,
    the same z-clustering re-fit on the cloned data) rather than a
    byte-copy — file layout is the ENGINE's contract, not the source
    cluster's history. Records ``_REPLICA.json`` (source path + the
    source manifest version the base includes) for the shipper.

    Returns the marker dict."""
    from accumulo_wikisearch_spark.operators.ingest import load_index, write_index
    from accumulo_wikisearch_spark.operators.layout import refit

    config = config or EngineConfig()
    index = load_index(spark, src, config)
    zorder = (
        refit(index.zlayout)
        if preserve_layout and index.zlayout is not None
        else None
    )
    write_index(index, dst, zorder=zorder)
    marker = {
        "source": src,
        # the source version whose generation the base was read from;
        # None = source was still a legacy (never-rewritten) catalog, so
        # the base includes no folded batches at all
        "source_version": index.manifest_version,
    }
    fs, _, jvm = _fs(spark, dst)
    HPath = jvm.org.apache.hadoop.fs.Path
    out = fs.create(HPath(f"{dst}/{_REPLICA_MARKER}"), True)
    out.write(bytearray(json.dumps(marker).encode()))
    out.close()
    return marker


def _replica_marker(spark: SparkSession, dst: str) -> dict:
    from accumulo_wikisearch_spark.operators.manifest import _open_json

    fs, _, jvm = _fs(spark, dst)
    body = _open_json(fs, jvm, f"{dst}/{_REPLICA_MARKER}")
    if body is None:
        raise ValueError(
            f"replicate_deltas: {dst} has no {_REPLICA_MARKER} — bootstrap"
            " the replica with clone_catalog first (the marker records"
            " which source version the base already includes)"
        )
    return body


def replicate_deltas(
    spark: SparkSession, src: str, dst: str
) -> list[str]:
    """Ship every published source batch the replica neither holds nor
    has folded, and that the replica's cloned base does not already
    include. Idempotent and restart-safe; returns the batch names
    shipped (sorted).

    Per batch: distributed parquet read→write of each table dir into the
    replica's hidden staging name, then the same atomic publish rename
    under the SAME batch id — so a replayed run skips it as already
    published, and the replica's own facade probe sees the batch the
    instant it publishes, exactly like a local flush."""
    from accumulo_wikisearch_spark.operators.manifest import (
        folded_deltas,
        list_versions,
        read_manifest_at,
    )

    marker = _replica_marker(spark, dst)
    if marker.get("source") != src:
        raise ValueError(
            f"replicate_deltas: {dst} was cloned from"
            f" {marker.get('source')!r}, not {src!r} — one replica tracks"
            " one source"
        )
    base_v = marker.get("source_version")
    # every source version AFTER the cloned base must still be a
    # retained FOLD manifest: a retired manifest's folds are unknowable
    # (set + dirs deleted together — a silent replica hole), and a
    # 'rewrite' generation changed content no delta records, so
    # clone+ship can no longer reconstruct the source. Versions are
    # minted sequentially, so retained manifests are a contiguous
    # suffix; a crash-orphaned generation number can break contiguity
    # and trips this check in the LOUD direction (re-clone), never the
    # silent one.
    floor = base_v if base_v is not None else 0
    newer = [v for v in list_versions(spark, src) if v > floor]
    expected = list(range(floor + 1, (max(newer) + 1) if newer else floor + 1))
    if newer != expected:
        raise RuntimeError(
            f"replicate_deltas: source versions {sorted(set(expected) - set(newer))}"
            f" after the cloned base (v{base_v}) are no longer retained at"
            f" {src} — their folded batches are unknowable. The replica"
            " fell behind the source's retention window: re-clone, or"
            " raise the source's retain_generations."
        )
    for v in newer:
        m = read_manifest_at(spark, src, v)
        if m.get("kind") != "fold":
            raise RuntimeError(
                f"replicate_deltas: source version {v} is a"
                f" '{m.get('kind', 'unmarked')}' generation — a full"
                " rewrite changed content no delta batch records, so"
                " shipping cannot reconstruct the source. Re-clone the"
                " replica from the current source state."
            )
    # batches the cloned base already contains: folded at the source by
    # manifests UP TO the cloned version (capped — later folds are real
    # changes the replica still needs)
    in_base = folded_deltas(spark, src, max_version=base_v if base_v else 0)
    src_dirs = raw_delta_names(spark, src)
    have = raw_delta_names(spark, dst) | folded_deltas(spark, dst)
    # every batch the source ever folded must be accounted for: in the
    # cloned base, already at the replica, or still shippable (dir on
    # disk). A batch outside all three fell past the source's retention
    # window — the replica cannot be completed by shipping
    lost = folded_deltas(spark, src) - in_base - have - src_dirs
    if lost:
        raise RuntimeError(
            f"replicate_deltas: source batches {sorted(lost)} were folded"
            f" at {src} and their grace dirs are gone (retention) before"
            " the replica received them — the replica fell behind the"
            " source's retention window. Re-clone, or raise the source's"
            " retain_generations to widen the shipping window."
        )
    ship = sorted(src_dirs - in_base - have)
    fs, _, jvm = _fs(spark, src)
    HPath = jvm.org.apache.hadoop.fs.Path
    for b in ship:
        tables = [
            st.getPath().getName()
            for st in fs.listStatus(HPath(f"{src}/deltas/{b}"))
            if st.isDirectory()
        ]
        staged = f"{dst}/deltas/{_STAGED_PREFIX}repl_{b}"
        for t in tables:
            if t not in _ALL_TABLES and t != "tombstones":
                raise RuntimeError(
                    f"replicate_deltas: unexpected table {t!r} in source"
                    f" batch {b!r} — refusing to ship a batch shape this"
                    " engine version does not understand"
                )
            spark.read.parquet(f"{src}/deltas/{b}/{t}").write.mode(
                "overwrite"
            ).parquet(f"{staged}/{t}")
        _publish_delta(
            spark, staged, f"{dst}/deltas/{b}", expect=tuple(tables)
        )
    return ship
