"""Unified cross-consumer lifecycle fuzz (r13, r12 verdict #5).

The pairwise property suites each fuzz one consumer kind against a
source (test_cdc_props: the CDC tail; test_replication_props: a
replica; test_lifecycle_props: snapshot readers). This file drives ALL
consumer kinds against ONE source catalog under a single random
maintenance schedule — the three-way interleavings (e.g. retention
retires a version the replica anchored but the tail didn't; a
changes-feed tap spans versions a sync already shipped) are where
cross-consumer bookkeeping bugs live. At every step each consumer must
equal its exact model or raise its curated error — never diverge
silently:

- the CDC documents tail delivers exactly the model's
  unconsumed-on-disk batches, and its reconcile guard raises the
  fell-behind error exactly when the tail's model says consumed-state
  is unprovable (model shared with test_cdc_props);
- the CDC DELETE tail (``stream_deletes``, its own checkpoint and so
  its own reconcile anchor — the PIPELINE.md dual-tail mirror topology)
  does the same for tombstone batches: the guard model is kind-
  symmetric, so a second TailModel with the batch roles swapped (data
  batches ride its irrelevant side) is exact. Cross-tail interleavings
  — e.g. a doc batch's fold advancing the delete tail's owed map past
  a tombstone batch it never saw — were unfuzzed before r14 (r13
  verdict #4);
- `sync_replica` leaves the replica facade equal to the brute-force
  live set, and raises the re-clone error exactly on a retained gap
  above its anchor;
- `read_changes` between any two retained snapshots returns exactly
  the appends/deletes folded in between;
- time-travel (`load_index(at_version=v)`) returns exactly the live
  set at the moment v was minted;
- `maintain_catalog`'s per-consumer headroom report matches the
  anchor + window − current arithmetic for both anchored consumers.
"""

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_cdc_props import Model as TailModel

from accumulo_wikisearch_spark.api import Wikisearch
from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    compact_index,
    maintain_catalog,
    read_changes,
    write_delta,
    write_tombstones,
)
from accumulo_wikisearch_spark.operators.ingest import (
    build_index,
    load_index,
    write_index,
)
from accumulo_wikisearch_spark.operators.replication import (
    clone_catalog,
    sync_replica,
)
from accumulo_wikisearch_spark.streaming.incremental import (
    stream_changes,
    stream_deletes,
)

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow

CFG = EngineConfig(num_partitions=1, uid_max=4)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"

op_st = st.one_of(
    st.tuples(st.just("flush"), st.integers(1, 2)),
    st.tuples(st.just("tomb"), st.integers(2, 4)),
    st.tuples(st.just("compact"), st.sampled_from([2, 3])),
    st.tuples(st.just("drain"), st.just(0)),
    st.tuples(st.just("drain_deletes"), st.just(0)),
    st.tuples(st.just("sync"), st.just(0)),
    st.tuples(st.just("check_changes"), st.just(0)),
    st.tuples(st.just("check_tt"), st.just(0)),
    st.tuples(st.just("maintain"), st.just(0)),
)


class Harness:
    """One source catalog + exact models for every consumer kind."""

    def __init__(self, spark, root):
        self.spark = spark
        self.root = root
        self.src = f"{root}/src"
        self.next_id = 0
        self.bid = 0
        base = self._arts(self._fresh_rows(3))
        write_index(build_index(base, CFG, SF), self.src)
        self.live = set(range(3))
        # --- source version model ---
        self.version = 0
        self.retained: list[int] = []
        self.ver_appends: dict[int, set] = {}  # doc ids folded at v
        self.ver_deletes: dict[int, set] = {}
        self.live_at: dict[int, set] = {}  # live set when v was minted
        self.pending_rows: dict[str, set] = {}  # data batch -> ids
        self.pending_tombs: dict[str, set] = {}
        # --- CDC tail model (shared with test_cdc_props) ---
        self.tail = TailModel()
        self.n_cp = 0
        self.cp = f"{root}/cp0"
        # --- CDC DELETE tail model: the same guard semantics with the
        # batch kinds swapped (its "data" side is the tombstone batches;
        # doc batches ride the irrelevant side). Own checkpoint = own
        # reconcile anchor, the dual-tail mirror topology. ---
        self.dtail = TailModel()
        self.n_dcp = 0
        self.dcp = f"{root}/dcp0"
        # --- replica model ---
        self.n_clone = 0
        self.dst = None
        self.replica_anchor = 0
        self.clone()

    def _arts(self, rows):
        return self.spark.createDataFrame(rows, SCHEMA)

    def _fresh_rows(self, n):
        rows = [
            (self.next_id + i, "enwiki", "tok", f"t{self.next_id + i}")
            for i in range(n)
        ]
        self.next_id += n
        return rows

    # ---- ops ----

    def flush(self, n):
        rows = self._fresh_rows(n)
        b = f"d{self.bid}"
        self.bid += 1
        write_delta(build_index(self._arts(rows), CFG, SF), self.src, b)
        self.pending_rows[b] = {r[0] for r in rows}
        self.live |= self.pending_rows[b]
        self.tail.pending_data.add(b)
        self.dtail.pending_tomb.add(b)  # the delete tail's foreign kind

    def tomb(self, k):
        dead = sorted(i for i in self.live if i % k == 0)
        if not dead:
            return
        b = f"t{self.bid}"
        self.bid += 1
        write_tombstones(
            self.spark.createDataFrame([(i,) for i in dead], "doc_id long"),
            self.src,
            b,
        )
        self.pending_tombs[b] = set(dead)
        self.live -= set(dead)
        self.tail.pending_tomb.add(b)
        self.dtail.pending_data.add(b)  # the delete tail's OWN kind

    def compact(self, retain):
        compact_index(self.spark, self.src, CFG, retain_generations=retain)
        self.version += 1
        v = self.version
        self.ver_appends[v] = set().union(*self.pending_rows.values(), set())
        self.ver_deletes[v] = set().union(*self.pending_tombs.values(), set())
        self.live_at[v] = set(self.live)
        self.pending_rows.clear()
        self.pending_tombs.clear()
        self.retained.append(v)
        del self.retained[:-retain]
        self.tail.compact(retain)
        self.dtail.compact(retain)

    def _drain_tail(self):
        got: list = []
        q = (
            stream_changes(self.spark, self.src, checkpoint=self.cp)
            .writeStream.foreachBatch(lambda df, _i: got.extend(df.collect()))
            .option("checkpointLocation", self.cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["batch"] for r in got}

    def drain(self, ops):
        err = self.tail.reconcile()
        if err is None:
            delivered = self._drain_tail()
            want = self.tail.on_disk_data() - self.tail.consumed
            assert delivered == want, f"drain: {ops}"
            self.tail.consumed |= delivered
        else:
            with pytest.raises(
                RuntimeError, match="fell behind the retention window"
            ):
                self._drain_tail()
            # documented remedy: fresh-checkpoint re-bootstrap
            self.n_cp += 1
            self.cp = f"{self.root}/cp{self.n_cp}"
            self.tail.rebootstrap()
            delivered = self._drain_tail()
            assert delivered == self.tail.on_disk_data(), f"rebootstrap: {ops}"
            self.tail.consumed |= delivered

    def _drain_delete_tail(self):
        got: list = []
        q = (
            stream_deletes(self.spark, self.src, checkpoint=self.dcp)
            .writeStream.foreachBatch(lambda df, _i: got.extend(df.collect()))
            .option("checkpointLocation", self.dcp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["batch"] for r in got}

    def drain_deletes(self, ops):
        err = self.dtail.reconcile()
        if err is None:
            delivered = self._drain_delete_tail()
            want = self.dtail.on_disk_data() - self.dtail.consumed
            assert delivered == want, f"drain_deletes: {ops}"
            self.dtail.consumed |= delivered
        else:
            with pytest.raises(
                RuntimeError, match="fell behind the retention window"
            ):
                self._drain_delete_tail()
            # documented remedy: fresh-checkpoint re-bootstrap (the
            # mirror re-reads a snapshot for the missed delete effects)
            self.n_dcp += 1
            self.dcp = f"{self.root}/dcp{self.n_dcp}"
            self.dtail.rebootstrap()
            delivered = self._drain_delete_tail()
            assert delivered == self.dtail.on_disk_data(), (
                f"delete rebootstrap: {ops}"
            )
            self.dtail.consumed |= delivered

    def clone(self):
        self.n_clone += 1
        self.dst = f"{self.root}/dst{self.n_clone}"
        clone_catalog(self.spark, self.src, self.dst, CFG)
        self.replica_anchor = self.version

    def _replica_docs(self):
        eng = Wikisearch.open(self.spark, self.dst, CFG)
        return sorted(
            r["doc_id"] for r in eng.query("TEXT == 'tok'").collect()
        )

    def sync(self, ops):
        gap = [
            v
            for v in range(self.replica_anchor + 1, self.version + 1)
            if v not in self.retained
        ]
        if gap:
            with pytest.raises(RuntimeError, match="no longer retained"):
                sync_replica(self.spark, self.src, self.dst, CFG)
            self.clone()
        sync_replica(self.spark, self.src, self.dst, CFG)
        self.replica_anchor = self.version
        assert self._replica_docs() == sorted(self.live), f"sync: {ops}"

    def check_changes(self, ops):
        if not self.retained:
            return
        since = self.retained[0]
        until = self.retained[-1]
        ch = read_changes(self.spark, self.src, since, until).collect()
        want = set()
        for v in range(since + 1, until + 1):
            want |= {("append", i) for i in self.ver_appends[v]}
            want |= {("delete", i) for i in self.ver_deletes[v]}
        assert {(r["change"], r["doc_id"]) for r in ch} == want, (
            f"changes {since}->{until}: {ops}"
        )

    def check_tt(self, ops):
        if not self.retained:
            return
        v = self.retained[0]  # the stalest retained snapshot
        idx = load_index(self.spark, self.src, CFG, at_version=v)
        got = sorted(
            r["doc_id"]
            for r in Wikisearch(idx).query("TEXT == 'tok'").collect()
        )
        assert got == sorted(self.live_at[v]), f"tt v{v}: {ops}"

    def maintain(self, ops):
        rep = maintain_catalog(
            self.spark,
            self.src,
            CFG,
            consumers=[
                {"kind": "replica", "ref": self.dst, "name": "replica"},
                {"kind": "cdc", "ref": self.cp, "name": "tail"},
                {"kind": "cdc", "ref": self.dcp, "name": "dtail"},
            ],
        )
        assert rep["current_version"] == (self.version or None), f"maintain: {ops}"
        window = len(self.retained)
        by = {r["name"]: r for r in rep["consumers"]}

        def want_headroom(anchor):
            if not self.retained:
                return None
            return anchor + window - self.version

        assert by["replica"]["status"] == "ok"
        assert by["replica"]["headroom_rewrites"] == want_headroom(
            self.replica_anchor
        ), f"replica headroom: {ops}"
        for nm, t in (("tail", self.tail), ("dtail", self.dtail)):
            if t.fresh:
                assert by[nm]["status"] == "no-anchor", f"{nm} status: {ops}"
            else:
                assert by[nm]["status"] == "ok"
                assert by[nm]["headroom_rewrites"] == want_headroom(
                    t.anchor
                ), f"{nm} headroom: {ops}"

    def step(self, op, k, ops):
        if op == "flush":
            self.flush(k)
        elif op == "tomb":
            self.tomb(k)
        elif op == "compact":
            self.compact(k)
        elif op == "drain":
            self.drain(ops)
        elif op == "drain_deletes":
            self.drain_deletes(ops)
        elif op == "sync":
            self.sync(ops)
        elif op == "check_changes":
            self.check_changes(ops)
        elif op == "check_tt":
            self.check_tt(ops)
        else:
            self.maintain(ops)


@pytest.mark.slow
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=3, max_size=8))
def test_random_schedule_all_consumers_match_models(spark, ops):
    h = Harness(spark, tempfile.mkdtemp(prefix="wikisearch-uniprops-"))
    for op, k in ops:
        h.step(op, k, ops)


@pytest.mark.slow
def test_seeded_long_schedule_all_consumers(spark):
    """A fixed 40-op seeded-random schedule, compact-heavy so both
    fell-behind paths (tail re-bootstrap AND replica re-clone) actually
    occur in one run, with the snapshot/changes readers and the
    maintain report interleaved throughout."""
    import random

    # seed picked by simulating the schedule against the pure-python
    # models: it produces one doc-tail drought, TWO delete-tail
    # droughts, and a replica re-clone in 44 steps
    rng = random.Random(22)
    h = Harness(spark, tempfile.mkdtemp(prefix="wikisearch-uniseed-"))
    names = [
        "flush", "tomb", "compact", "drain", "drain_deletes", "sync",
        "check_changes", "check_tt", "maintain",
    ]
    weights = [4, 2, 6, 2, 1, 2, 2, 1, 1]
    for step_i in range(44):
        op = rng.choices(names, weights=weights)[0]
        k = {"flush": rng.randint(1, 2), "tomb": rng.randint(2, 4),
             "compact": rng.choice([2, 3])}.get(op, 0)
        h.step(op, k, f"seeded step {step_i}: {op}")
    # the droughts actually happened: every consumer kind fell behind at
    # least once and recovered through its curated path — INCLUDING the
    # delete tail's guard raise + fresh-checkpoint re-bootstrap (r13
    # verdict #4: the cross-tail interleavings were unfuzzed)
    assert h.n_cp > 0, "documents tail never fell behind"
    assert h.n_dcp > 0, "delete tail never fell behind"
    assert h.n_clone > 1, "replica never needed a re-clone"
