"""Property-fuzzed CDC tail under random maintenance schedules (r12).

test_lifecycle_props fuzzes the facade; test_replication_props fuzzes
the two-catalog ledger; this file fuzzes the round's centerpiece — the
streaming tail plus its reconcile guard — against an exact model:

- a DRAIN (checkpointed availableNow run) must deliver exactly the
  published, still-on-disk, kind-relevant batches the checkpoint has
  not consumed (exactly-once, folds invisible, staging invisible);
- a drain's CONSTRUCTION must raise the curated fell-behind error
  EXACTLY when the model says consumed-state cannot be proven complete:
  some version in (anchor, current] was minted AND retired with no
  construction in between (fold set unknowable), or an owed batch is
  both unconsumed and retired. Never a false alarm (consumed history
  retiring is fine; data-only versions never trip... this harness runs
  the documents tail, so tombstone batches are never owed), never a
  silent skip;
- after an expected raise, the documented remedy (fresh-checkpoint
  re-bootstrap) delivers exactly what retention still holds.

The model mirrors the guard's persisted-fold-set semantics: owed fold
sets accumulate per successful construction, the anchor advances
through fully-consumed versions, and nothing else is assumed.

(Hypothesis earned its keep during development: a naive first model
owed everything since catalog BIRTH and was falsified by
[tombstone, compact, compact, flush, flush, compact, drain] — the real
guard correctly anchors a fresh subscription at min(retained)-1, owing
only what is still deliverable. The spec below is the one the engine
actually implements, confirmed rather than assumed.)
"""

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    compact_index,
    write_delta,
    write_tombstones,
)
from accumulo_wikisearch_spark.operators.ingest import build_index, write_index
from accumulo_wikisearch_spark.streaming.incremental import stream_changes

# long-running property/soak suite: excluded from the default run
# (pytest.ini addopts -m 'not slow'); run with `-m ""` for the full gate
pytestmark = pytest.mark.slow


CFG = EngineConfig(num_partitions=1, uid_max=4)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"

op_st = st.one_of(
    st.tuples(st.just("flush"), st.integers(1, 2)),
    st.tuples(st.just("tombstone"), st.just(0)),
    st.tuples(st.just("compact"), st.sampled_from([2, 3])),
    st.tuples(st.just("drain"), st.just(0)),
)


class Model:
    """Exact mirror of catalog + checkpoint state for the documents tail."""

    def __init__(self):
        self.version = 0
        self.retained: list[int] = []
        self.folds: dict[int, set] = {}  # version -> DATA batches it folded
        self.pending_data: set = set()  # published, unfolded data batches
        self.pending_tomb: set = set()
        self.consumed: set = set()  # checkpoint's committed seen batches
        self.fresh = True  # no anchor file yet: subscription starts at
        # the first SUCCESSFUL construction, owing only what is still
        # deliverable then (versions retired before it are not owed)
        self.anchor = 0
        self.owed: dict[int, set] = {}  # guard's persisted fold map

    def on_disk_data(self) -> set:
        out = set(self.pending_data)
        for v in self.retained:
            out |= self.folds.get(v, set())
        return out

    def compact(self, retain: int):
        self.version += 1
        self.folds[self.version] = set(self.pending_data)
        self.pending_data, self.pending_tomb = set(), set()
        self.retained.append(self.version)
        del self.retained[:-retain]

    def reconcile(self) -> str | None:
        """Returns the expected error class, or None; mutates guard state
        exactly like a construction would (state persists only on
        success — a raising construction leaves the anchor file alone)."""
        if self.fresh:
            anchor = min(self.retained) - 1 if self.retained else 0
            owed: dict[int, set] = {}
        else:
            anchor = self.anchor
            owed = dict(self.owed)
        for v in self.retained:
            if v > anchor and v not in owed:
                owed[v] = set(self.folds.get(v, set()))
        if any(v not in owed for v in range(anchor + 1, self.version + 1)):
            return "unknowable"
        disk = self.on_disk_data()
        for v in sorted(owed):
            if any(b not in self.consumed and b not in disk for b in owed[v]):
                return "missing"
        while anchor + 1 in owed and owed[anchor + 1] <= self.consumed:
            anchor += 1
            del owed[anchor]
        self.anchor, self.owed, self.fresh = anchor, owed, False
        return None

    def rebootstrap(self):
        self.consumed = set()
        self.fresh = True
        self.owed = {}
        assert self.reconcile() is None  # a fresh construction never errs


@pytest.mark.slow
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(op_st, min_size=2, max_size=8))
def test_random_schedule_cdc_tail_matches_exact_model(spark, ops):
    root = tempfile.mkdtemp(prefix="wikisearch-cdcprops-")
    path = f"{root}/index"

    def arts(rows):
        return spark.createDataFrame(rows, SCHEMA)

    write_index(
        build_index(arts([(0, "enwiki", "base", "t0")]), CFG, SF), path
    )
    m = Model()
    next_id = [1]
    n_cp = [0]
    cp = [f"{root}/cp0"]

    def drain():
        got: list = []
        q = (
            stream_changes(spark, path, checkpoint=cp[0])
            .writeStream.foreachBatch(lambda df, _i: got.extend(df.collect()))
            .option("checkpointLocation", cp[0])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["batch"] for r in got}

    for op, k in ops:
        if op == "flush":
            rows = [
                (next_id[0] + i, "enwiki", "tok", f"t{next_id[0] + i}")
                for i in range(k)
            ]
            b = f"d{next_id[0]}"
            write_delta(build_index(arts(rows), CFG, SF), path, b)
            next_id[0] += k
            m.pending_data.add(b)
        elif op == "tombstone":
            b = f"t{next_id[0]}"
            write_tombstones(
                spark.createDataFrame([(0,)], "doc_id long"), path, b
            )
            next_id[0] += 1
            m.pending_tomb.add(b)
        elif op == "compact":
            compact_index(spark, path, CFG, retain_generations=k)
            m.compact(k)
        else:  # drain
            err = m.reconcile()
            if err is None:
                delivered = drain()
                want = m.on_disk_data() - m.consumed
                assert delivered == want, f"drain: {ops}"
                m.consumed |= delivered
            else:
                with pytest.raises(
                    RuntimeError, match="fell behind the retention window"
                ):
                    drain()
                # the documented remedy: fresh-checkpoint re-bootstrap
                n_cp[0] += 1
                cp[0] = f"{root}/cp{n_cp[0]}"
                m.rebootstrap()
                delivered = drain()
                assert delivered == m.on_disk_data(), f"rebootstrap: {ops}"
                m.consumed |= delivered
