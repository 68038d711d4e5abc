"""Long-schedule soak of the unified cross-consumer lifecycle harness —
the runnable promotion of r13's inlined transcript script
(tools/soak_r13.txt; r13 verdict #6). Drives
tests/test_unified_lifecycle_props.Harness (every consumer kind — CDC
documents tail, CDC delete tail, replica, changes feed, time travel,
maintain report — against one source catalog under a random maintenance
schedule, each checked against its exact model at every step).

Usage: python tools/soak_unified.py [seed] [n_ops]
       (defaults 20260816 120 — the r13 evidence run's shape)
"""

import random
import sys
import tempfile
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_repo))
sys.path.insert(0, str(_repo / "tests"))

from accumulo_wikisearch_spark.session import get_spark  # noqa: E402

spark = get_spark("wikisearch-soak")
spark.sparkContext.setLogLevel("ERROR")

from test_unified_lifecycle_props import Harness  # noqa: E402

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 20260816
n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 120

rng = random.Random(seed)
h = Harness(spark, tempfile.mkdtemp(prefix="wikisearch-soak-"))
names = ["flush", "tomb", "compact", "drain", "drain_deletes", "sync",
         "check_changes", "check_tt", "maintain"]
weights = [4, 2, 6, 3, 2, 2, 2, 1, 2]
for i in range(n_ops):
    op = rng.choices(names, weights=weights)[0]
    k = {"flush": rng.randint(1, 2), "tomb": rng.randint(2, 4),
         "compact": rng.choice([2, 3])}.get(op, 0)
    h.step(op, k, f"soak step {i}: {op}")
    if (i + 1) % 20 == 0:
        print(
            f"step {i + 1}/{n_ops} ok (version {h.version},"
            f" clones {h.n_clone}, cps {h.n_cp}, dcps {h.n_dcp})",
            file=sys.stderr,
        )
print(
    f"SOAK OK: {n_ops} ops (seed {seed}), final version {h.version},"
    f" re-clones {h.n_clone - 1}, doc-tail re-bootstraps {h.n_cp},"
    f" delete-tail re-bootstraps {h.n_dcp}",
    file=sys.stderr,
)
