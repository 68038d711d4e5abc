"""Catalog replication: clone bootstrap + O(batch) delta shipping, and
the loud failure modes when a replica falls behind the source's
retention window or the source was rewritten wholesale."""

import pytest
from pyspark.sql import functions as F

from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    compact_index,
    delta_batches,
    write_delta,
    write_tombstones,
)
from accumulo_wikisearch_spark.operators.ingest import build_index, write_index
from accumulo_wikisearch_spark.operators.replication import (
    clone_catalog,
    replicate_deltas,
)

CFG = EngineConfig(num_partitions=1, uid_max=20)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"


def _arts(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _flush(spark, path, ids, batch):
    d = _arts(spark, [(i, "enwiki", "tok wave", f"t{i}") for i in ids])
    write_delta(build_index(d, CFG, SF), path, batch)


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    base = _arts(spark, [(i, "enwiki", "tok base", f"t{i}") for i in range(5)])
    write_index(build_index(base, CFG, SF), path)
    return path


def _docs(spark, path):
    return sorted(
        r["doc_id"]
        for r in Wikisearch.open(spark, path, CFG)
        .query("TEXT == 'tok'")
        .collect()
    )


def test_clone_then_ship_matches_source(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    marker = clone_catalog(spark, src, dst, CFG)
    assert marker["source_version"] is None  # legacy source at clone time
    assert _docs(spark, dst) == list(range(5))

    _flush(spark, src, range(5, 8), "b0")
    write_tombstones(
        spark.createDataFrame([(0,)], "doc_id long"), src, "del0"
    )
    shipped = replicate_deltas(spark, src, dst)
    assert shipped == ["b0", "del0"]
    assert _docs(spark, dst) == _docs(spark, src) == list(range(1, 8))
    # idempotent: nothing new to ship
    assert replicate_deltas(spark, src, dst) == []


def test_replica_is_a_normal_catalog(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    _flush(spark, src, range(5, 8), "b0")
    replicate_deltas(spark, src, dst)
    # the replica compacts on its OWN cadence...
    compact_index(spark, dst, CFG)
    assert delta_batches(spark, dst) == []
    assert _docs(spark, dst) == list(range(8))
    # ...and keeps shipping: a batch the replica already FOLDED is not
    # re-shipped, the next source batch is
    _flush(spark, src, [20], "b1")
    assert replicate_deltas(spark, src, dst) == ["b1"]
    assert _docs(spark, dst) == list(range(8)) + [20]


@pytest.mark.slow
def test_ship_survives_source_compaction_within_grace(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    _flush(spark, src, [10], "b0")
    compact_index(spark, src, CFG)  # folds b0 (v1); dir stays in grace
    shipped = replicate_deltas(spark, src, dst)
    assert shipped == ["b0"]
    assert _docs(spark, dst) == _docs(spark, src)


def test_clone_of_versioned_source_skips_folded_batches(spark, src, tmp_path):
    _flush(spark, src, [10], "b0")
    compact_index(spark, src, CFG)  # v1 folds b0
    dst = str(tmp_path / "dst")
    marker = clone_catalog(spark, src, dst, CFG)
    assert marker["source_version"] == 1
    # b0's grace dir still exists at the source, but the cloned base
    # already includes it — shipping it again would double-count
    assert replicate_deltas(spark, src, dst) == []
    assert _docs(spark, dst) == _docs(spark, src)


@pytest.mark.slow
def test_fell_behind_retention_raises(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    # three compactions with the default window retire v1 (and delete
    # the delta dirs it folded) before the replica ever shipped them
    for n in range(3):
        _flush(spark, src, [10 + n], f"b{n}")
        compact_index(spark, src, CFG)
    with pytest.raises(RuntimeError, match="no longer retained"):
        replicate_deltas(spark, src, dst)


def test_source_rewrite_requires_reclone(spark, src, tmp_path):
    from accumulo_wikisearch_spark.operators.compaction import swap_in_catalog

    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    staged = str(tmp_path / "staged")
    write_index(
        build_index(_arts(spark, [(9, "enwiki", "tok new", "t9")]), CFG, SF),
        staged,
    )
    swap_in_catalog(spark, staged, src)  # kind="rewrite"
    with pytest.raises(RuntimeError, match="'rewrite' generation"):
        replicate_deltas(spark, src, dst)


def test_unbootstrapped_or_wrong_source_raises(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    with pytest.raises(ValueError, match="clone_catalog first"):
        replicate_deltas(spark, src, dst)
    clone_catalog(spark, src, dst, CFG)
    with pytest.raises(ValueError, match="one replica tracks one source"):
        replicate_deltas(spark, str(tmp_path / "other"), dst)


@pytest.mark.slow
def test_no_double_ship_after_replica_fold_history_retires(spark, src, tmp_path):
    """r11 third review F1: the replica's own fold manifests retire, and
    with them the replica-side record of a received batch — the durable
    marker ledger must prevent a long-lived source pending batch from
    being shipped twice and double-counted."""
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    _flush(spark, src, [10], "b0")  # stays PENDING at the source
    assert replicate_deltas(spark, src, dst) == ["b0"]
    # three replica-side compaction cycles retire the replica manifest
    # that folded b0 (deleting its grace dir and fold record)
    for n in range(3):
        _flush(spark, dst, [20 + n], f"local{n}")
        compact_index(spark, dst, CFG)
    from accumulo_wikisearch_spark.operators.manifest import folded_deltas

    assert "b0" not in folded_deltas(spark, dst)  # fold record retired
    assert replicate_deltas(spark, src, dst) == []  # ledger remembers
    assert _docs(spark, dst) == list(range(5)) + [10, 20, 21, 22]


@pytest.mark.slow
def test_sync_per_window_survives_unbounded_source_compactions(spark, src, tmp_path):
    """r11 third review F2: each sync advances the marker's anchor to the
    source's current version, so a replica that ships once per source
    retention window keeps working through arbitrarily many source
    compactions (the old clone-time anchor forced a re-clone after
    retain_generations+1 of them)."""
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    for n in range(4):
        _flush(spark, src, [10 + n], f"b{n}")
        assert replicate_deltas(spark, src, dst) == [f"b{n}"]
        compact_index(spark, src, CFG)  # retires old source versions
    # one final sync across the last compaction: nothing left to ship,
    # and no spurious fell-behind error
    assert replicate_deltas(spark, src, dst) == []
    assert _docs(spark, dst) == _docs(spark, src) == list(range(5)) + [10, 11, 12, 13]


def test_marker_source_path_is_spelling_insensitive(spark, src, tmp_path):
    """r11 third review F5: the one-replica-one-source guard compares
    filesystem-qualified paths, not raw strings."""
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    _flush(spark, src, [10], "b0")
    assert replicate_deltas(spark, f"file:{src}", dst) == ["b0"]  # scheme spelled out
    assert replicate_deltas(spark, src + "/", dst) == []  # trailing slash


@pytest.mark.slow
def test_same_name_collision_raises_crash_recovery_adopts(spark, src, tmp_path):
    """r12 ADVICE: a replica-LOCAL batch colliding with a source batch id
    must raise (name-suppressed shipping would silently diverge), while
    the documented crash window (batch published at the replica, marker
    write lost) is adopted with a warning — the contents tell them
    apart."""
    import warnings

    from accumulo_wikisearch_spark.operators.replication import _write_marker

    dst = str(tmp_path / "dst")
    marker = clone_catalog(spark, src, dst, CFG)
    # replica-LOCAL flush minting the same id a later source flush uses
    _flush(spark, dst, [100, 101], "b0")
    _flush(spark, src, [10], "b0")  # different content, same id
    with pytest.raises(RuntimeError, match="collided with a source batch id"):
        replicate_deltas(spark, src, dst)
    # crash-recovery twin: replica holds a FAITHFUL copy of the source
    # batch but the ledger never recorded it (marker write lost) —
    # rewind the marker to the post-clone state to simulate the crash
    dst2 = str(tmp_path / "dst2")
    marker2 = clone_catalog(spark, src, dst2, CFG)
    assert replicate_deltas(spark, src, dst2) == ["b0"]
    _write_marker(spark, dst2, marker2)  # the crash: ledger update lost
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert replicate_deltas(spark, src, dst2) == []  # adopt, not re-ship
    assert any("crash-recovered ship" in str(x.message) for x in w)
    # adopted into the ledger: the next sync is silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert replicate_deltas(spark, src, dst2) == []
    assert _docs(spark, dst2) == _docs(spark, src)


def test_same_name_equal_counts_different_content_raises(spark, src, tmp_path):
    """r13 (r12 ADVICE strengthening): a replica-local id collision whose
    per-table ROW COUNTS coincide with the source batch must still raise
    — adoption is gated on a full content signature (count + summed
    row-hash), not the weak count compare that would adopt divergent
    content with only a warning."""
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    # one-row flushes on both sides: identical table sets and per-table
    # row counts, different row values (ids/titles/index keys differ)
    _flush(spark, dst, [100], "b0")  # replica-local batch
    _flush(spark, src, [10], "b0")  # source batch under the same id
    with pytest.raises(RuntimeError, match="content signatures differ"):
        replicate_deltas(spark, src, dst)


@pytest.mark.slow
def test_sync_replica_one_call_loop(spark, src, tmp_path):
    """r12 (verdict #6): sync_replica = ship + threshold-gated replica
    compaction + the ops dict with anchor-vs-retention headroom."""
    from accumulo_wikisearch_spark.operators.replication import sync_replica

    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    # legacy source: nothing to ship, no retention clock
    rep = sync_replica(spark, src, dst, CFG)
    assert rep["shipped"] == [] and rep["headroom_rewrites"] is None

    _flush(spark, src, [10, 11], "b0")
    rep = sync_replica(spark, src, dst, CFG)
    assert rep["shipped"] == ["b0"] and not rep["compacted"]
    assert rep["replica_pending_deltas"] == ["b0"]

    # threshold crossed -> the same call folds the replica backlog
    _flush(spark, src, [12], "b1")
    rep = sync_replica(spark, src, dst, CFG, compact_min_files=1)
    assert rep["shipped"] == ["b1"] and rep["compacted"]
    assert rep["replica_pending_deltas"] == []
    assert _docs(spark, dst) == list(range(5)) + [10, 11, 12]

    # headroom: after the source compacts (v1) and a sync anchors on it,
    # the replica can survive len(retained) more rewrites before re-clone
    compact_index(spark, src, CFG)  # v1
    rep = sync_replica(spark, src, dst, CFG)
    assert rep["source_current_version"] == 1
    assert rep["source_version"] == 1  # anchor advanced
    assert rep["headroom_rewrites"] == len(rep["source_retained_versions"])


def test_describe_catalog_reports_replica_state(spark, src, tmp_path):
    """r12: the ops/--describe view surfaces the replica marker (source,
    sync anchor, received ledger) next to the version history — a
    replica operator otherwise had to read _REPLICA.json by hand."""
    from accumulo_wikisearch_spark.operators.compaction import describe_catalog

    assert describe_catalog(spark, src)["replica_of"] is None
    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)
    _flush(spark, src, [10], "b0")
    replicate_deltas(spark, src, dst)
    d = describe_catalog(spark, dst)
    assert d["replica_of"]["source"].endswith("/src")
    assert d["replica_of"]["received"] == ["b0"]
    assert d["pending_deltas"] == ["b0"]


@pytest.mark.slow
def test_maintain_catalog_primary_ops_loop(spark, src, tmp_path):
    """r13 (r12 verdict #6): the PRIMARY catalog's one-call ops loop —
    threshold compaction plus per-consumer retention headroom, so
    "how close is my slowest consumer to falling out of retention"
    stops being a hand-derived number. Covers all three consumer kinds,
    the upsert-by-name registry, the describe_catalog surface, and the
    diagnostic statuses (no-anchor, foreign-source)."""
    from accumulo_wikisearch_spark.operators.compaction import (
        describe_catalog,
        maintain_catalog,
        register_consumer,
    )
    from accumulo_wikisearch_spark.streaming.incremental import stream_changes

    dst = str(tmp_path / "dst")
    clone_catalog(spark, src, dst, CFG)  # legacy source: anchor None -> v0
    _flush(spark, src, [10], "b1")
    cp = str(tmp_path / "cp")

    def drain():
        q = (
            stream_changes(spark, src, checkpoint=cp)
            .writeStream.format("noop")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # tail consumes b1; anchor at v0 (no manifests yet)
    rep = maintain_catalog(
        spark,
        src,
        CFG,
        compact_min_files=1,
        consumers=[
            {"kind": "replica", "ref": dst},
            {"kind": "cdc", "ref": cp},
        ],
    )
    assert rep["compacted"] and rep["current_version"] == 1
    by_kind = {r["kind"]: r for r in rep["consumers"]}
    # both consumers are anchored at v0: one retained version, current 1
    # -> headroom 0 (the NEXT rewrite strands an unsynced consumer)
    assert by_kind["replica"]["anchor"] == 0
    assert by_kind["replica"]["headroom_rewrites"] == 0
    assert by_kind["cdc"]["headroom_rewrites"] == 0
    assert rep["min_headroom_rewrites"] == 0
    # consumers catch up; a named version tap pins v1
    drain()  # reconcile observes v1 (b1 consumed) -> cdc anchor 1
    replicate_deltas(spark, src, dst)  # replica anchor -> 1
    rep = maintain_catalog(
        spark,
        src,
        CFG,
        compact_min_files=1,
        consumers=[{"kind": "version", "ref": 1, "name": "eval-pin"}],
    )
    assert not rep["compacted"] and rep["pending_deltas"] == []
    by_key = {r.get("name") or r["kind"]: r for r in rep["consumers"]}
    assert by_key["replica"]["headroom_rewrites"] == 1
    assert by_key["cdc"]["anchor"] == 1 and by_key["cdc"]["headroom_rewrites"] == 1
    assert by_key["eval-pin"]["headroom_rewrites"] == 1
    assert rep["min_headroom_rewrites"] == 1
    # upsert-by-name: re-pinning the tap replaces its row
    rows = register_consumer(spark, src, "version", 1, name="eval-pin")
    assert len(rows) == 3
    # the describe surface renders the same report
    desc = describe_catalog(spark, src)
    assert {r["kind"] for r in desc["consumers"]} == {"replica", "cdc", "version"}
    # diagnostic statuses render instead of raising: a replica path with
    # no marker, and a checkpoint anchored to a DIFFERENT catalog
    other = str(tmp_path / "other")
    base = _arts(spark, [(77, "enwiki", "tok", "t77")])
    write_index(build_index(base, CFG, SF), other)
    _flush(spark, other, [78], "ob1")
    ocp = str(tmp_path / "ocp")
    q = (
        stream_changes(spark, other, checkpoint=ocp)
        .writeStream.format("noop")
        .option("checkpointLocation", ocp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rep = maintain_catalog(
        spark,
        src,
        CFG,
        consumers=[
            {"kind": "replica", "ref": str(tmp_path / "nothere"), "name": "r2"},
            {"kind": "cdc", "ref": ocp, "name": "t2"},
        ],
    )
    by_name = {r.get("name"): r for r in rep["consumers"] if r.get("name")}
    assert by_name["r2"]["status"] == "no-anchor"
    assert by_name["t2"]["status"] == "foreign-source"
    assert by_name["r2"]["headroom_rewrites"] is None
    # statuses don't poison the alarm number (computed over anchored rows)
    assert rep["min_headroom_rewrites"] == 1
