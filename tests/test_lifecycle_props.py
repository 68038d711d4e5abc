"""Property-fuzzed catalog maintenance lifecycle (r11).

The fixed LSM tests pin one schedule each (flush→compact,
tombstone→compact, …); hypothesis draws RANDOM maintenance schedules —
interleaved delta flushes, tombstone flushes, and major compactions
with varying reader-grace windows — and asserts that ONE long-lived
facade tracks the catalog exactly after every step, with no manual
reload: the freshness probe must catch every kind of change (pending
batch appeared, manifest version flipped, deltas folded), and the
merge-read fold + tombstone shadowing must compose in any order.

The oracle is a plain Python dict of live documents — the simplest
possible statement of what the reference's scan-time combiner stack
guarantees (Accumulo scans see every flushed write and no deleted one,
README.md:206-219).
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
from accumulo_wikisearch_spark.operators.ingest import (
    build_index,
    load_index,
    write_index,
)

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow

# uid_max=4 so drawn schedules cross the exact-uid → degraded posting
# tier boundary as doc counts grow
CFG = EngineConfig(num_partitions=1, uid_max=4)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"

op_st = st.one_of(
    st.tuples(st.just("flush"), st.integers(1, 3)),  # flush k fresh docs
    st.tuples(st.just("tombstone"), st.integers(2, 4)),  # delete ids % k == 0
    st.tuples(st.just("compact"), st.sampled_from([2, 3])),  # retain window
)


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=1, max_size=5))
def test_random_maintenance_schedule_facade_matches_oracle(spark, ops):
    path = tempfile.mkdtemp(prefix="wikisearch-lifecycle-") + "/index"

    def arts(rows):
        return spark.createDataFrame(rows, SCHEMA)

    next_id = [0]

    def fresh_rows(n):
        rows = [
            (next_id[0] + i, "enwiki", "tok", f"t{next_id[0] + i}")
            for i in range(n)
        ]
        next_id[0] += n
        return rows

    base_rows = fresh_rows(3)
    write_index(build_index(arts(base_rows), CFG, SF), path)
    live = {r[0] for r in base_rows}
    eng = Wikisearch(load_index(spark, path, CFG))  # never reloaded by hand
    bid = [0]

    for op, k in ops:
        if op == "flush":
            rows = fresh_rows(k)
            write_delta(build_index(arts(rows), CFG, SF), path, f"b{bid[0]}")
            bid[0] += 1
            live |= {r[0] for r in rows}
        elif op == "tombstone":
            dead = sorted(i for i in live if i % k == 0)
            if not dead:
                continue
            write_tombstones(
                spark.createDataFrame([(i,) for i in dead], "doc_id long"),
                path,
                f"b{bid[0]}",
            )
            bid[0] += 1
            live -= set(dead)
        else:
            compact_index(spark, path, CFG, retain_generations=k)
        got = sorted(r["doc_id"] for r in eng.query("TEXT == 'tok'").collect())
        assert got == sorted(live), f"after {op}({k}): {got} != {sorted(live)}"


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=2, max_size=5))
def test_random_schedule_snapshots_and_changes_feed_match_oracle(spark, ops):
    """Snapshot/CDC invariants under the same randomized maintenance
    schedules (r11): every compaction's minted version must time-travel
    to EXACTLY the live set at that moment (tombstones applied, folds
    in), for as long as it stays retained; and between adjacent retained
    fold versions, read_changes must report exactly the rows flushed and
    the ids tombstoned in that window."""
    from accumulo_wikisearch_spark.operators.compaction import read_changes
    from accumulo_wikisearch_spark.operators.manifest import (
        list_versions,
        manifest_version,
    )

    path = tempfile.mkdtemp(prefix="wikisearch-lifecycle-tt-") + "/index"

    def arts(rows):
        return spark.createDataFrame(rows, SCHEMA)

    next_id = [0]

    def fresh_rows(n):
        rows = [
            (next_id[0] + i, "enwiki", "tok", f"t{next_id[0] + i}")
            for i in range(n)
        ]
        next_id[0] += n
        return rows

    base_rows = fresh_rows(3)
    write_index(build_index(arts(base_rows), CFG, SF), path)
    live = {r[0] for r in base_rows}
    bid = [0]
    window_adds: set[int] = set()
    window_dels: set[int] = set()
    snap_live: dict[int, set] = {}
    feed_adds: dict[int, set] = {}
    feed_dels: dict[int, set] = {}

    for op, k in ops:
        if op == "flush":
            rows = fresh_rows(k)
            write_delta(build_index(arts(rows), CFG, SF), path, f"b{bid[0]}")
            bid[0] += 1
            live |= {r[0] for r in rows}
            window_adds |= {r[0] for r in rows}
        elif op == "tombstone":
            dead = sorted(i for i in live if i % k == 0)
            if not dead:
                continue
            write_tombstones(
                spark.createDataFrame([(i,) for i in dead], "doc_id long"),
                path,
                f"b{bid[0]}",
            )
            bid[0] += 1
            live -= set(dead)
            window_dels |= set(dead)
        else:
            compact_index(spark, path, CFG, retain_generations=k)
            v = manifest_version(spark, path)
            snap_live[v] = set(live)
            feed_adds[v] = set(window_adds)
            feed_dels[v] = set(window_dels)
            window_adds, window_dels = set(), set()

    retained = list_versions(spark, path)
    for v in retained:
        assert v in snap_live  # every version here came from our compacts
        snap = load_index(spark, path, CFG, at_version=v)
        got = sorted(
            r["doc_id"] for r in snap.documents.select("doc_id").collect()
        )
        assert got == sorted(snap_live[v]), f"snapshot v{v}"
    for a, b in zip(retained, retained[1:]):
        ch = read_changes(spark, path, a, b).collect()
        adds = {r["doc_id"] for r in ch if r["change"] == "append"}
        dels = {r["doc_id"] for r in ch if r["change"] == "delete"}
        # versions are minted sequentially by our compacts, so adjacent
        # retained versions span exactly the windows recorded for (a, b]
        want_adds = set().union(
            *(feed_adds[v] for v in snap_live if a < v <= b)
        )
        want_dels = set().union(
            *(feed_dels[v] for v in snap_live if a < v <= b)
        )
        assert adds == want_adds, f"feed ({a},{b}] adds"
        assert dels == want_dels, f"feed ({a},{b}] dels"
