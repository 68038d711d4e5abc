"""Consumer-registry lifecycle (r13 verdict #5 + ADVICE):

- publishes are serialized through a compare-and-swap retry loop on
  generation-versioned ``_CONSUMERS.N.json`` files (rename onto an
  existing name fails on HDFS/local FS), so concurrent registrations
  cannot drop each other and a complete registry survives every crash
  point (the old delete+rename protocol had a no-registry-on-disk
  window);
- one consumer is one row: upsert matches on (kind, ref) regardless of
  names AND on name (the old ``name or (kind, ref)`` key accumulated
  duplicate rows when the same consumer was registered once named and
  once unnamed, double-counting it in every headroom report);
- ``unregister_consumer`` retires decommissioned consumers;
- ``maintain_catalog`` ages rows stuck at status no-anchor and reports
  them in ``stale_consumers`` after ``no_anchor_grace`` consecutive
  reports — reported, never auto-pruned.
"""

import json
import os

import pytest

from accumulo_wikisearch_spark.operators import compaction as C
from accumulo_wikisearch_spark.operators.compaction import (
    maintain_catalog,
    register_consumer,
    unregister_consumer,
)


def _rows(spark, path):
    return C._registered_consumers(spark, path)


def _gens(path):
    return sorted(
        n for n in os.listdir(path) if C._CONSUMERS_RE.match(n)
    )


def test_upsert_named_then_unnamed_is_one_row_keeping_name(spark, tmp_path):
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "cdc", "/cp/tail", name="tail-a")
    rows = register_consumer(spark, path, "cdc", "/cp/tail")  # unnamed
    assert len(rows) == 1
    assert rows[0] == {"kind": "cdc", "ref": "/cp/tail", "name": "tail-a"}


def test_upsert_unnamed_then_named_is_one_row(spark, tmp_path):
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "replica", "/mnt/replica")
    rows = register_consumer(spark, path, "replica", "/mnt/replica", name="dr")
    assert len(rows) == 1
    assert rows[0]["name"] == "dr"


def test_named_version_tap_rebinds_ref(spark, tmp_path):
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "version", 3, name="nightly")
    rows = register_consumer(spark, path, "version", 7, name="nightly")
    assert len(rows) == 1
    assert rows[0]["ref"] == 7


def test_unregister_by_name_and_by_kind_ref_idempotently(spark, tmp_path):
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "cdc", "/cp/a", name="a")
    register_consumer(spark, path, "replica", "/rep/b")
    rows = unregister_consumer(spark, path, name="a")
    assert [r["kind"] for r in rows] == ["replica"]
    rows = unregister_consumer(spark, path, kind="replica", ref="/rep/b")
    assert rows == []
    # idempotent: absent consumer is a no-op
    assert unregister_consumer(spark, path, name="a") == []
    with pytest.raises(ValueError, match="registry wipe"):
        unregister_consumer(spark, path)
    with pytest.raises(ValueError, match="registry wipe"):
        unregister_consumer(spark, path, kind="cdc")  # ref missing


def test_publish_cas_retries_on_lost_race(spark, tmp_path, monkeypatch):
    """A writer holding a stale read loses the rename to the generation
    a concurrent winner already published, and must re-read + re-apply
    so BOTH rows survive (the r13 protocol dropped one)."""
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "cdc", "/cp/winner", name="winner")
    real = C._read_consumers_versioned
    calls = [0]

    def stale_once(spark_, p):
        calls[0] += 1
        if calls[0] == 1:
            return 0, []  # stale view from before the winner published
        return real(spark_, p)

    monkeypatch.setattr(C, "_read_consumers_versioned", stale_once)
    rows = register_consumer(spark, path, "replica", "/rep/loser", name="loser")
    assert calls[0] >= 2  # the CAS loop actually retried
    assert {r["name"] for r in rows} == {"winner", "loser"}
    assert {r["name"] for r in _rows(spark, path)} == {"winner", "loser"}


def test_crash_points_always_leave_a_complete_registry(spark, tmp_path):
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "cdc", "/cp/a", name="a")
    register_consumer(spark, path, "replica", "/rep/b", name="b")
    # current + previous generations retained (reader grace); a crash
    # between stage and rename leaves only an invisible uuid tmp
    gens = _gens(path)
    assert len(gens) == 2
    open(f"{path}/._consumers_tmp_deadbeef", "w").write("{garbage")
    assert {r["name"] for r in _rows(spark, path)} == {"a", "b"}
    # maintenance sweeps the debris
    maintain_catalog(spark, path)
    assert not os.path.exists(f"{path}/._consumers_tmp_deadbeef")


def test_legacy_unversioned_registry_upgrades_in_place(spark, tmp_path):
    path = str(tmp_path / "cat")
    os.makedirs(path)
    legacy = {"consumers": [{"kind": "version", "ref": 2, "name": "pin"}]}
    open(f"{path}/_CONSUMERS.json", "w").write(json.dumps(legacy))
    assert _rows(spark, path) == legacy["consumers"]
    rows = register_consumer(spark, path, "cdc", "/cp/x", name="x")
    assert {r["name"] for r in rows} == {"pin", "x"}
    assert not os.path.exists(f"{path}/_CONSUMERS.json")  # adopted+retired
    assert _gens(path) == ["_CONSUMERS.000001.json"]


def test_maintain_reports_stale_no_anchor_consumers(spark, tmp_path):
    """A consumer registered but never synced stays status no-anchor;
    after no_anchor_grace consecutive reports it surfaces in
    stale_consumers — and recovers (counter resets) the moment its
    anchor appears. Never auto-pruned."""
    from accumulo_wikisearch_spark.operators.replication import _qualified

    path = str(tmp_path / "cat")
    rep = str(tmp_path / "replica")
    register_consumer(spark, path, "replica", rep, name="dr")
    for i in range(2):
        out = maintain_catalog(spark, path, no_anchor_grace=3)
        assert out["consumers"][0]["status"] == "no-anchor"
        assert out["consumers"][0]["no_anchor_reports"] == i + 1
        assert out["stale_consumers"] == []
    out = maintain_catalog(spark, path, no_anchor_grace=3)
    assert out["stale_consumers"] == [
        {"kind": "replica", "ref": rep, "name": "dr"}
    ]
    # still registered — reported, not pruned
    assert len(out["consumers"]) == 1
    # the replica syncs (its anchor marker appears) → status ok, counter
    # resets, stale report clears
    os.makedirs(rep, exist_ok=True)
    open(f"{rep}/_REPLICA.json", "w").write(
        json.dumps({"source": _qualified(spark, path), "source_version": 0})
    )
    out = maintain_catalog(spark, path, no_anchor_grace=3)
    assert out["consumers"][0]["status"] == "ok"
    assert out["consumers"][0]["no_anchor_reports"] == 0
    assert out["stale_consumers"] == []
    # the counter reset is durable, not per-report
    assert not any(
        c.get("no_anchor_reports") for c in _rows(spark, path)
    )


def test_consumers_param_re_registration_preserves_aging(spark, tmp_path):
    """The documented primary ops loop — maintain_catalog(path,
    consumers=[...]) every cycle — re-registers each listed consumer
    per report; the upsert must carry no_anchor_reports across or the
    counter resets to 0 every call and stale_consumers can never trip
    (r14 review)."""
    path = str(tmp_path / "cat")
    spec = [{"kind": "replica", "ref": str(tmp_path / "replica"), "name": "dr"}]
    for i in range(2):
        out = maintain_catalog(spark, path, consumers=spec, no_anchor_grace=3)
        assert out["consumers"][0]["no_anchor_reports"] == i + 1
        assert out["stale_consumers"] == []
    out = maintain_catalog(spark, path, consumers=spec, no_anchor_grace=3)
    assert out["consumers"][0]["no_anchor_reports"] == 3
    assert out["stale_consumers"] == [spec[0]]


def test_noop_re_registration_burns_no_generation(spark, tmp_path):
    """A content-identical re-registration (the steady-state
    consumers=[...] report) must not publish a new registry generation:
    no generation-number churn, no widened CAS window, no extra FS
    round-trips (r14 review)."""
    path = str(tmp_path / "cat")
    register_consumer(spark, path, "cdc", "/cp/tail", name="tail")
    before = _gens(path)
    rows = register_consumer(spark, path, "cdc", "/cp/tail", name="tail")
    assert _gens(path) == before
    assert rows == [{"kind": "cdc", "ref": "/cp/tail", "name": "tail"}]
    # an unnamed re-registration of the same (kind, ref) keeps the name
    # — also content-identical, also a no-op
    register_consumer(spark, path, "cdc", "/cp/tail")
    assert _gens(path) == before


def test_registry_read_retries_when_legacy_upgrade_races(
    spark, tmp_path, monkeypatch
):
    """Reader lists the registry (sees only the legacy unversioned
    file), then a concurrent publisher adopts the legacy rows into
    generation 1 and prunes the legacy file before the reader opens it.
    The reader must re-list and return generation 1's rows — not report
    an empty registry for the cycle, which would render a headroom
    report with no consumers while one may be about to fall out of the
    retention window (r14 review)."""
    from accumulo_wikisearch_spark.operators import manifest as M

    path = str(tmp_path / "cat")
    os.makedirs(path)
    legacy = {"consumers": [{"kind": "version", "ref": 2, "name": "pin"}]}
    open(f"{path}/_CONSUMERS.json", "w").write(json.dumps(legacy))
    real = M._open_json
    hit = [0]

    def racing(fs, jvm, p):
        if p.endswith("/_CONSUMERS.json") and hit[0] == 0:
            hit[0] = 1
            os.remove(f"{path}/_CONSUMERS.json")
            open(f"{path}/_CONSUMERS.000001.json", "w").write(
                json.dumps(legacy)
            )
            return None
        return real(fs, jvm, p)

    monkeypatch.setattr(M, "_open_json", racing)
    g, rows = C._read_consumers_versioned(spark, path)
    assert hit[0] == 1
    assert (g, rows) == (1, legacy["consumers"])


def test_registry_read_empty_catalog_is_empty_not_retry_exhaustion(
    spark, tmp_path
):
    """A catalog with no registry at all returns (0, []) immediately —
    the race-retry branch must not turn 'genuinely empty' into five
    futile re-listings or a RuntimeError."""
    path = str(tmp_path / "cat")
    os.makedirs(path)
    assert C._read_consumers_versioned(spark, path) == (0, [])
