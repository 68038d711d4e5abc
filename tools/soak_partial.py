"""Differential soak of the FILE-level CDC reconcile guard under random
schedules WITH partial (mid-batch) drains — the runnable promotion of
r13's inlined transcript script (tools/soak_partial_r13.txt; r13
verdict #6).

Usage: python tools/soak_partial.py [first_seed] [n_schedules] [n_ops]
       (defaults 41 30 10 — the r13 evidence run)

Ground truth: the checkpoint's committed seen-file log, parsed by an
INDEPENDENT minimal parser (commits dir + sources JSON lines). The
model computes expected guard verdicts (raise / pass) and expected
delivery sets from that ground truth and a from-spec mirror of the
anchor semantics; the engine's own bookkeeping (per-window consumed
counts, pending map, log_pos skipping) must agree on every schedule —
i.e. the engine's incremental counts must equal the full-log-derived
totals at all times.

Repo untouched; run on the frozen r13 gate code.
"""
import json
import os
import random
import sys
import tempfile
import traceback

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from accumulo_wikisearch_spark.session import get_spark

spark = get_spark("wikisearch-partial-soak")
spark.sparkContext.setLogLevel("ERROR")

from accumulo_wikisearch_spark.config import EngineConfig
from accumulo_wikisearch_spark.operators.compaction import (
    compact_index,
    write_delta,
    write_tombstones,
)
from accumulo_wikisearch_spark.operators.ingest import build_index, write_index
from accumulo_wikisearch_spark.streaming.incremental import stream_changes

CFG = EngineConfig(num_partitions=1, uid_max=4)
SF = {"ID": "id", "TITLE": "title"}
SCHEMA = "id long, language string, text string, title string"


def arts(rows):
    return spark.createDataFrame(rows, SCHEMA)


def committed_files(cp):
    """Independent parse of the checkpoint: {batch: set(paths)} of files
    in COMMITTED micro-batches."""
    commits = f"{cp}/commits"
    if not os.path.isdir(commits):
        return {}
    committed = max(
        (int(n) for n in os.listdir(commits) if n.isdigit()), default=-1
    )
    out = {}
    src = f"{cp}/sources"
    if committed < 0 or not os.path.isdir(src):
        return {}
    for dirpath, _dirs, files in os.walk(src):
        for fn in files:
            if fn.startswith("."):
                continue
            for line in open(os.path.join(dirpath, fn)):
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if int(e.get("batchId", -1)) > committed:
                    continue
                p = e.get("path", "")
                seg = p.split("/deltas/")
                if len(seg) < 2:
                    continue
                rest = seg[-1].split("/")
                if len(rest) >= 3 and rest[1] == "documents":
                    out.setdefault(rest[0], set()).add(p)
    return out


class Spec:
    """From-spec mirror of the guard's anchor semantics, file-level."""

    def __init__(self):
        self.fresh = True
        self.anchor = 0
        self.owed = {}  # v -> {batch: n_files}

    def reconcile(self, retained, folds, version, consumed_counts, on_disk):
        if self.fresh:
            anchor = min(retained) - 1 if retained else 0
            owed = {}
        else:
            anchor = self.anchor
            owed = {v: dict(m) for v, m in self.owed.items()}
        for v in retained:
            if v > anchor and v not in owed:
                owed[v] = dict(folds.get(v, {}))
        if any(v not in owed for v in range(anchor + 1, version + 1)):
            return "unknowable"

        def comp(b, nf):
            return consumed_counts.get(b, 0) >= nf

        for v in sorted(owed):
            if any(
                not comp(b, nf) and b not in on_disk
                for b, nf in owed[v].items()
            ):
                return "missing"
        while anchor + 1 in owed and all(
            comp(b, nf) for b, nf in owed[anchor + 1].items()
        ):
            anchor += 1
            del owed[anchor]
        self.anchor, self.owed, self.fresh = anchor, owed, False
        return None


def run_schedule(seed, n_ops):
    rng = random.Random(seed)
    root = tempfile.mkdtemp(prefix="wikisearch-psoak-")
    path = f"{root}/index"
    write_index(build_index(arts([(0, "enwiki", "base", "t0")]), CFG, SF), path)

    batches = {}  # data batch -> {"files": int, "ids": set}
    tomb_n = [0]
    version = [0]
    retained = []
    folds = {}  # v -> {batch: n_files} (DATA batches only)
    pending = set(batches)
    next_id = [1]
    bid = [0]
    n_cp = [0]
    cp = [f"{root}/cp0"]
    spec = Spec()
    delivered_ids = []  # per current checkpoint, every delivered doc_id

    from accumulo_wikisearch_spark.operators.compaction import _count_files

    def flush(nf):
        ids = list(range(next_id[0], next_id[0] + nf))
        next_id[0] += nf
        b = f"d{bid[0]}"
        bid[0] += 1
        rows = [(i, "enwiki", "tok", f"t{i}") for i in ids]
        df = arts(rows).repartition(nf) if nf > 1 else arts(rows)
        write_delta(build_index(df, CFG, SF), path, b)
        n = _count_files(spark, f"{path}/deltas/{b}/documents")
        batches[b] = {"files": n, "ids": set(ids)}
        pending.add(b)

    def tomb():
        b = f"t{tomb_n[0]}"
        tomb_n[0] += 1
        write_tombstones(spark.createDataFrame([(0,)], "doc_id long"), path, b)

    def compact(retain):
        compact_index(spark, path, CFG, retain_generations=retain)
        version[0] += 1
        folds[version[0]] = {b: batches[b]["files"] for b in pending}
        pending.clear()
        retained.append(version[0])
        del retained[:-retain]

    def on_disk_data():
        out = set(pending)
        for v in retained:
            out |= set(folds.get(v, {}))
        return out

    def drain(stop_after=None):
        got = []
        calls = [0]

        def fb(df, _bid):
            calls[0] += 1
            if stop_after is not None and calls[0] > stop_after:
                raise RuntimeError("injected mid-batch stop")
            got.extend(df.collect())

        q = (
            stream_changes(
                spark, path, max_files_per_trigger=1, checkpoint=cp[0]
            )
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", cp[0])
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        except Exception as e:
            if "injected mid-batch stop" not in str(e):
                raise
        return [r["doc_id"] for r in got]

    def attempt(kind):
        consumed = committed_files(cp[0])
        counts = {b: len(ps) for b, ps in consumed.items()}
        err = spec.reconcile(retained, folds, version[0], counts, on_disk_data())
        if err is not None:
            try:
                drain()
                raise AssertionError(
                    f"guard MISSED expected {err} (seed {seed})"
                )
            except RuntimeError as e:
                assert "fell behind the retention window" in str(e), (
                    f"wrong error for {err}: {e}"
                )
            # remedy: fresh checkpoint
            n_cp[0] += 1
            cp[0] = f"{root}/cp{n_cp[0]}"
            spec.__init__()
            delivered_ids.clear()
            got = drain()
            delivered_ids.extend(got)
        else:
            stop_after = rng.choice([1, 2]) if kind == "partial" else None
            got = drain(stop_after=stop_after)
            delivered_ids.extend(got)
        # invariants vs ground truth after every attempt:
        consumed = committed_files(cp[0])
        truth_ids = set()
        for b, ps in consumed.items():
            if len(ps) >= batches[b]["files"]:
                # fully consumed: known row set (dir may be retired)
                truth_ids |= batches[b]["ids"]
                continue
            # partially consumed: the dir must still exist (its
            # retirement would have raised at the last construction)
            for p in ps:
                local = p.replace("file:", "")
                assert os.path.exists(local), (
                    f"partially-consumed batch {b} retired without a"
                    f" raise (seed {seed})"
                )
                for r in spark.read.parquet(local).collect():
                    truth_ids.add(r["doc_id"])
        assert set(delivered_ids) == truth_ids, (
            f"delivered != committed truth (seed {seed})"
        )
        assert len(delivered_ids) == len(set(delivered_ids)), (
            f"double delivery (seed {seed})"
        )
        # committed file counts never exceed the batch's file count
        for b, ps in consumed.items():
            if b in batches:
                assert len(ps) <= batches[b]["files"]

    ops = ["flush", "tomb", "compact", "full", "partial"]
    weights = [4, 1, 5, 2, 3]
    for _step in range(n_ops):
        op = rng.choices(ops, weights=weights)[0]
        if op == "flush":
            flush(rng.choice([1, 2, 2]))
        elif op == "tomb":
            tomb()
        elif op == "compact":
            compact(rng.choice([2, 3]))
        elif op == "full":
            attempt("full")
        else:
            attempt("partial")
    # closing: a final full drain must converge to all on-disk content
    attempt("full")
    return n_cp[0]


first_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 41
n_schedules = int(sys.argv[2]) if len(sys.argv) > 2 else 30
n_ops = int(sys.argv[3]) if len(sys.argv) > 3 else 10
total_rebootstraps = 0
for i, seed in enumerate(range(first_seed, first_seed + n_schedules)):
    try:
        total_rebootstraps += run_schedule(seed, n_ops=n_ops)
    except Exception:
        print(f"SCHEDULE FAILED seed={seed}", file=sys.stderr)
        traceback.print_exc()
        sys.exit(1)
    print(f"schedule {i+1}/{n_schedules} (seed {seed}) ok", file=sys.stderr)
print(
    f"PARTIAL-SOAK OK: {n_schedules} schedules x {n_ops} ops + closing drains,"
    f" {total_rebootstraps} guard-raise/rebootstrap cycles exercised",
    file=sys.stderr,
)