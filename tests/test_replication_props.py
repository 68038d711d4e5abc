"""Property-fuzzed two-catalog replication (r12, verdict #3).

The fixed replication tests pin one schedule each; hypothesis draws
RANDOM interleavings of source flushes / tombstone flushes / source
compactions (varying retention) with replica syncs, replica-local
flushes, and replica compactions, and asserts the two invariants the
ledger/anchor arithmetic must hold under ANY schedule:

1. after every successful sync, a long-lived facade on the REPLICA
   equals the brute-force oracle over the source's live set at that
   moment (plus any replica-local docs) — no double-ship, no missed
   batch, no resurrected delete;
2. a sync raises the curated fell-behind error EXACTLY when the model
   says the source's retention outran the replica's anchor (a retained
   gap above it) — loud precisely when reconstruction is impossible,
   never a false alarm, never a silent hole — and a re-clone + sync
   recovers.

This is the two-catalog twin of test_lifecycle_props.py; the r7
subnormal lesson says random schedules break bookkeeping like
``replication.py``'s ledger/anchor logic before fixed tests do.
"""

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    compact_index,
    write_delta,
    write_tombstones,
)
from accumulo_wikisearch_spark.operators.ingest import build_index, write_index
from accumulo_wikisearch_spark.operators.replication import (
    clone_catalog,
    sync_replica,
)

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow

CFG = EngineConfig(num_partitions=1, uid_max=4)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"

op_st = st.one_of(
    st.tuples(st.just("src_flush"), st.integers(1, 3)),
    st.tuples(st.just("src_tomb"), st.integers(2, 4)),
    st.tuples(st.just("src_compact"), st.sampled_from([2, 3])),
    # sync alone, or sync + threshold-triggered replica compaction
    st.tuples(st.just("sync"), st.sampled_from([0, 1])),
    st.tuples(st.just("dst_flush"), st.integers(1, 2)),
    st.tuples(st.just("dst_compact"), st.sampled_from([2, 3])),
)


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=2, max_size=7))
def test_random_two_catalog_schedule_replica_matches_oracle(spark, ops):
    root = tempfile.mkdtemp(prefix="wikisearch-replprops-")
    src = f"{root}/src"

    def arts(rows):
        return spark.createDataFrame(rows, SCHEMA)

    next_id = [0]

    def fresh_rows(n, base=0):
        rows = [
            (base + next_id[0] + i, "enwiki", "tok", f"t{base + next_id[0] + i}")
            for i in range(n)
        ]
        next_id[0] += n
        return rows

    base_rows = fresh_rows(3)
    write_index(build_index(arts(base_rows), CFG, SF), src)
    src_live = {r[0] for r in base_rows}

    # ---- source retention model: versions minted + retained suffix ----
    src_version = [0]
    retained: list[int] = []

    def model_compact(retain):
        src_version[0] += 1
        retained.append(src_version[0])
        del retained[:-retain]

    # ---- replica state ----
    n_clone = [0]
    dst = [None]
    eng_dst = [None]
    anchor = [0]
    dst_local: set[int] = set()
    bid = [0]

    def clone():
        n_clone[0] += 1
        dst[0] = f"{root}/dst{n_clone[0]}"
        clone_catalog(spark, src, dst[0], CFG)
        eng_dst[0] = Wikisearch.open(spark, dst[0], CFG)  # long-lived facade
        anchor[0] = src_version[0]
        dst_local.clear()

    clone()
    expected = set(src_live)  # replica truth as of the last sync/clone

    def facade_docs():
        return sorted(
            r["doc_id"] for r in eng_dst[0].query("TEXT == 'tok'").collect()
        )

    for op, k in ops:
        if op == "src_flush":
            rows = fresh_rows(k)
            write_delta(build_index(arts(rows), CFG, SF), src, f"s{bid[0]}")
            bid[0] += 1
            src_live.update(r[0] for r in rows)
        elif op == "src_tomb":
            dead = sorted(i for i in src_live if i % k == 0)
            if not dead:
                continue
            write_tombstones(
                spark.createDataFrame([(i,) for i in dead], "doc_id long"),
                src,
                f"s{bid[0]}",
            )
            bid[0] += 1
            src_live -= set(dead)
        elif op == "src_compact":
            compact_index(spark, src, CFG, retain_generations=k)
            model_compact(k)
        elif op == "dst_flush":
            # replica-local ingest in a DISJOINT id namespace (the
            # documented best practice the collision audit enforces)
            rows = fresh_rows(k, base=100_000)
            write_delta(
                build_index(arts(rows), CFG, SF), dst[0], f"local{bid[0]}"
            )
            bid[0] += 1
            dst_local.update(r[0] for r in rows)
            expected.update(r[0] for r in rows)
        elif op == "dst_compact":
            compact_index(spark, dst[0], CFG, retain_generations=k)
        else:  # sync
            gap = [
                v
                for v in range(anchor[0] + 1, src_version[0] + 1)
                if v not in retained
            ]
            if gap:
                # the model says reconstruction is impossible — the sync
                # must raise the curated error, and re-clone recovers
                with pytest.raises(RuntimeError, match="no longer retained"):
                    sync_replica(spark, src, dst[0], CFG)
                clone()
                sync_replica(spark, src, dst[0], CFG)
                expected = set(src_live)
            else:
                rep = sync_replica(
                    spark, src, dst[0], CFG,
                    compact_min_files=(1 if k else None),
                )
                anchor[0] = src_version[0]
                if retained:
                    assert rep["source_version"] == src_version[0]
                expected = set(src_live) | set(dst_local)
            assert facade_docs() == sorted(expected), f"after sync: {ops}"
        # the facade must track replica-side changes continuously
        assert facade_docs() == sorted(expected), f"after {op}({k}): {ops}"


@pytest.mark.slow
def test_seeded_long_schedule_with_fell_behind_recovery(spark):
    """A fixed 60-op seeded-random schedule that guarantees the
    fell-behind → raise → re-clone → recover path runs every time (the
    hypothesis examples above may not draw 3+ unsynced compactions),
    plus sustained alternation long after hypothesis's shrunk sizes."""
    import random

    rng = random.Random(712)
    root = tempfile.mkdtemp(prefix="wikisearch-replseed-")
    src = f"{root}/src"

    def arts(rows):
        return spark.createDataFrame(rows, SCHEMA)

    next_id = [0]

    def fresh(n, base=0):
        rows = [
            (base + next_id[0] + i, "enwiki", "tok", f"t{base + next_id[0] + i}")
            for i in range(n)
        ]
        next_id[0] += n
        return rows

    base_rows = fresh(3)
    write_index(build_index(arts(base_rows), CFG, SF), src)
    src_live = {r[0] for r in base_rows}
    src_version, retained = [0], []
    n_clone, dst, eng, anchor = [0], [None], [None], [0]
    dst_local: set[int] = set()
    bid = [0]

    def clone():
        n_clone[0] += 1
        dst[0] = f"{root}/dst{n_clone[0]}"
        clone_catalog(spark, src, dst[0], CFG)
        eng[0] = Wikisearch.open(spark, dst[0], CFG)
        anchor[0] = src_version[0]
        dst_local.clear()

    clone()
    expected = set(src_live)
    fell_behind_seen = [0]

    def docs():
        return sorted(r["doc_id"] for r in eng[0].query("TEXT == 'tok'").collect())

    # weighted so multi-compact droughts between syncs actually happen
    ops = rng.choices(
        ["src_flush", "src_tomb", "src_compact", "sync", "dst_flush"],
        weights=[4, 2, 5, 3, 1],
        k=60,
    )
    for step, op in enumerate(ops):
        if op == "src_flush":
            rows = fresh(rng.randint(1, 2))
            write_delta(build_index(arts(rows), CFG, SF), src, f"s{bid[0]}")
            bid[0] += 1
            src_live.update(r[0] for r in rows)
        elif op == "src_tomb":
            k = rng.randint(2, 4)
            dead = sorted(i for i in src_live if i % k == 0)
            if not dead:
                continue
            write_tombstones(
                spark.createDataFrame([(i,) for i in dead], "doc_id long"),
                src,
                f"s{bid[0]}",
            )
            bid[0] += 1
            src_live -= set(dead)
        elif op == "src_compact":
            compact_index(spark, src, CFG)
            src_version[0] += 1
            retained.append(src_version[0])
            del retained[:-2]
        elif op == "dst_flush":
            rows = fresh(1, base=100_000)
            write_delta(build_index(arts(rows), CFG, SF), dst[0], f"local{bid[0]}")
            bid[0] += 1
            dst_local.update(r[0] for r in rows)
            expected.update(r[0] for r in rows)
        else:
            gap = [
                v
                for v in range(anchor[0] + 1, src_version[0] + 1)
                if v not in retained
            ]
            if gap:
                fell_behind_seen[0] += 1
                with pytest.raises(RuntimeError, match="no longer retained"):
                    sync_replica(spark, src, dst[0], CFG)
                clone()
                sync_replica(spark, src, dst[0], CFG)
                expected = set(src_live)
            else:
                sync_replica(spark, src, dst[0], CFG)
                anchor[0] = src_version[0]
                expected = set(src_live) | set(dst_local)
            assert docs() == sorted(expected), f"step {step} sync"
    assert fell_behind_seen[0] >= 1  # the drought actually occurred
    assert docs() == sorted(expected)
